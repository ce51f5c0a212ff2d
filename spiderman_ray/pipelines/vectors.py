"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k as the exact baseline: the query matrix is tiny and
broadcast once (``ray.put``); every batch does one float64 matmul against
it — no shuffle, embarrassingly parallel. The scale path (documented, and
what IVF would add): cluster centroids broadcast, per-batch assignment to
nearest centroid, then per-centroid top-k via groupby — same two stages,
one extra bucketing key. An LSH-bucketed variant reuses the MinHash banding
machinery in pipelines/text.py with random hyperplanes.

Float handling: all scores are computed in float64 and results expose only
integer columns (ids, ranks) plus scores rounded to 1e-6, so the DuckDB
oracle (list_cosine_similarity, also float64) hash-matches.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _pq(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _batch_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def ann_cosine_topk(sf_dir: str, n_queries: int = 8, k: int = 5) -> pa.Table:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Per-batch: normalize, matmul against the broadcast (d x q) query block,
    keep each batch's local top-k per query (partial top-k combiner), then
    one tiny global reduce on the driver. Ties break by vec_id ascending.
    Output: (query_id, neighbor_id, rank) — rank 1..k.
    """
    qtab = pq.read_table(_pq(sf_dir)).slice(0, n_queries)
    qids = qtab["vec_id"].to_pylist()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qtab["embedding"].to_pylist()])
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((np.array(qids), qnorm))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q = ray.get(qref)
        m = _batch_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q.T  # (batch, nq)
        ids = batch["vec_id"].to_numpy()
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, qid in enumerate(q_ids):
            col = sims[:, j]
            mask = ids != qid
            cand_ids, cand_sims = ids[mask], col[mask]
            order = np.lexsort((cand_ids, -cand_sims))[: k]
            out["query_id"].extend([qid] * len(order))
            out["neighbor_id"].extend(cand_ids[order])
            out["sim"].extend(cand_sims[order])
        return pd.DataFrame(out)

    partials = (
        rd.read_parquet(_pq(sf_dir))
        .map_batches(local_topk, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), int(r["neighbor_id"]), rank))
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


def cosine_dup_pairs(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Embedding-cosine near-dup pairs (a < b, sim > threshold; 0.45 yields pairs in the synthetic embeddings): blocked
    matmul of each batch against the full normalized matrix (broadcast once).
    O(n^2) exact at test scale; the IVF/LSH bucketing above is the 100 TB
    path. Returns (a, b) int pairs."""
    tab = pq.read_table(_pq(sf_dir))
    ids_all = np.asarray(tab["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"].to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m_all = ray.get(ref)
        m = _batch_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m_all.T
        bids = batch["vec_id"].to_numpy()
        ai, bj = np.nonzero(sims > threshold)
        a, b = bids[ai], all_ids[bj]
        keep = a < b
        return pd.DataFrame({"a": a[keep].astype("int64"), "b": b[keep].astype("int64")})

    res = (
        rd.read_parquet(_pq(sf_dir))
        .map_batches(pairs, batch_format="pandas", batch_size=2048)
        .to_pandas()
    )
    if res.empty:  # keep the (a, b) int64 schema even with zero pairs
        res = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    else:
        res = res.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def _kmeans(mat: np.ndarray, k: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    """Small seeded k-means on (pre-normalized) vectors — centroid fitting
    runs on a sample at scale; here the sample is the table."""
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) or 1.0)
    return cents


def ann_ivf_topk(
    sf_dir: str, n_queries: int = 8, k: int = 5, n_centroids: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF-style approximate top-k — the 100 TB scale path for similarity
    search: centroids are broadcast, each batch assigns its vectors to a
    cluster and emits partial top-k ONLY for queries probing that cluster.
    Work drops from O(n*q) to ~O(n*q*nprobe/n_centroids). Same output shape
    as ``ann_cosine_topk``; tests check recall against the exact baseline.
    """
    tab = pq.read_table(_pq(sf_dir))
    qids = tab["vec_id"].to_pylist()[:n_queries]
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"].to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = _kmeans(mat, n_centroids)
    qmat = mat[:n_queries]
    # per-query probed clusters
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((np.array(qids), qmat, cents, probes))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q, c, pr = ray.get(ref)
        m = _batch_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ c.T, axis=1)
        ids = batch["vec_id"].to_numpy()
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for j, qid in enumerate(q_ids):
            cand_mask = np.isin(assign, pr[j]) & (ids != qid)
            if not cand_mask.any():
                continue
            sims = m[cand_mask] @ q[j]
            cand_ids = ids[cand_mask]
            order = np.lexsort((cand_ids, -sims))[:k]
            out["query_id"].extend([qid] * len(order))
            out["neighbor_id"].extend(cand_ids[order])
            out["sim"].extend(sims[order])
        return pd.DataFrame(out)

    partials = (
        rd.read_parquet(_pq(sf_dir))
        .map_batches(local_topk, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), int(r["neighbor_id"]), rank))
    return pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]), preserve_index=False
    )


def embedding_norms(sf_dir: str) -> rd.Dataset:
    """Per-vector L2 norm x1e6 as int64 (stable hashing) — the simplest
    vectorized map_batches over the list<float> column."""

    def norms(batch: pd.DataFrame) -> pd.DataFrame:
        m = _batch_matrix(batch)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"],
                "norm_x1e6": np.round(np.linalg.norm(m, axis=1) * 1e6).astype("int64"),
            }
        )

    return rd.read_parquet(_pq(sf_dir)).map_batches(norms, batch_format="pandas")
