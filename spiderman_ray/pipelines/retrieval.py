"""Ranked retrieval over the documents table — BM25 (Robertson &
Zaragoza 2009, public) as a two-pass streaming pipeline:

1. **Corpus-statistics pass**: one O(|terms|)-row partial per batch
   (per-term document frequency + batch doc/token counts) merged on the
   driver into the tiny (df, N, avgdl) model — the kmeans
   integer-lattice pattern; nothing corpus-sized leaves the workers and
   no inverted index is materialized for a fixed query workload (the ES
   analog in ``sources/sinks.py`` owns the stored-index path).
2. **Scoring pass**: a stateless map with the O(|terms|) idf table in
   its closure scores every (doc, query) and keeps a per-batch top-k
   combiner, so the final per-query exchange carries O(blocks x queries
   x k) rows — the ``top_tokens`` provable-containment argument: the
   global top-k is a subset of the union of per-batch top-ks.

Float contract (oracle bit-parity): BM25 constants are DYADIC rationals
(k1 = 1.25, b = 0.75 — exactly representable, immune to the measured
DuckDB 1-ULP shortest-repr parse hazard); every per-(doc, term) score is
floored to an integer BEFORE the per-doc sum, so accumulation order can
never change the hash:

    idf   = ln((N - df + 0.5) / (df + 0.5) + 1.0)          # >= ln(1) > 0
    tfn   = (tf * 2.25) / (tf + 1.25 * (0.25 + (0.75 * dl) / avgdl))
    score = sum over query terms with tf > 0 of floor(idf * tfn * 1e6)

Each float op is mirrored left-to-right in the DuckDB oracle (the HLL
ln-parity precedent)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from spiderman_ray.pipelines.text import _read_docs

#: fixed demo query workload (terms from the corpus vocabulary, like the
#: ES analog's ES_TERMS); query ids sort stably
BM25_QUERIES: list[tuple[str, tuple[str, ...]]] = [
    ("q0", ("join", "slow")),
    ("q1", ("vector", "merge", "sort")),
    ("q2", ("spark",)),
    ("q3", ("customer", "window")),
]

BM25_TOPK = 20


def _corpus_stats(ds: rd.Dataset, terms: list[str]) -> tuple[dict, int, int]:
    """(df per term, n_docs, total token count) via O(|terms|)-row
    per-batch partials + a driver merge (O(blocks x terms) rows)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        df_ = dict.fromkeys(terms, 0)
        total_dl = 0
        for t in texts:
            ws = [w for w in t.split(" ") if w]
            total_dl += len(ws)
            s = set(ws)
            for q in terms:
                if q in s:
                    df_[q] += 1
        return pd.DataFrame(
            {
                "term": terms + ["__corpus__"],
                "df": [df_[t] for t in terms] + [len(texts)],
                "dl": [0] * len(terms) + [total_dl],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("term", sort=False)[["df", "dl"]].sum()
    n_docs = int(agg.loc["__corpus__", "df"])
    total_dl = int(agg.loc["__corpus__", "dl"])
    df = {t: int(agg.loc[t, "df"]) for t in terms}
    return df, n_docs, total_dl


def bm25_search(sf_dir: str, k: int = BM25_TOPK) -> rd.Dataset:
    """BM25 top-k per query over the documents table.
    Output: (query, doc_id, score, rank) — score is the exact integer
    sum of per-term floor(idf * tfn * 1e6) contributions, rank the
    1-based position by (score desc, doc_id asc)."""
    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    ds = _read_docs(sf_dir)
    df, n_docs, total_dl = _corpus_stats(ds, terms)
    avgdl = total_dl / n_docs
    idf = {
        t: math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in terms
    }

    def score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(ids)
        dl = np.zeros(n, dtype=np.int64)
        tf = {t: np.zeros(n, dtype=np.int64) for t in terms}
        for i, t in enumerate(texts):
            ws = [w for w in t.split(" ") if w]
            dl[i] = len(ws)
            for w in ws:
                col = tf.get(w)
                if col is not None:
                    col[i] += 1
        # per-(doc, term) integer contributions, floored BEFORE summing
        contrib = {}
        for t in terms:
            tfv = tf[t].astype(np.float64)
            tfn = (tfv * 2.25) / (tfv + 1.25 * (0.25 + (0.75 * dl) / avgdl))
            c = np.floor(idf[t] * tfn * 1e6).astype(np.int64)
            contrib[t] = np.where(tf[t] > 0, c, 0)
        out_q, out_id, out_s = [], [], []
        ids_np = np.asarray(ids, dtype=np.int64)
        for qid, qterms in BM25_QUERIES:
            s = np.zeros(n, dtype=np.int64)
            for t in qterms:
                s += contrib[t]
            hit = s > 0
            # per-batch top-k combiner: the global top-k by
            # (score desc, doc_id asc) is contained in the union of
            # per-batch top-ks under the same order
            hid, hs = ids_np[hit], s[hit]
            if len(hs) > k:
                order = np.lexsort((hid, -hs))[:k]
                hid, hs = hid[order], hs[order]
            out_q.extend([qid] * len(hid))
            out_id.extend(hid.tolist())
            out_s.extend(hs.tolist())
        return pa.table(
            {
                "query": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query", "doc_id", "score", "rank"]]

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query")
        .map_groups(topk, batch_format="pandas")
    )
