"""Iterative graph algorithms over Ray Data — the power-iteration family.

``pagerank`` runs a fixed number of synchronous supersteps over a link
graph, each superstep = two bounded exchanges (the shard-grouped
bucketed-join shape shared with ``text.anti_join_ids``):

1. co-partition edges with the current ranks by hash64(src) % 64 and emit
   per-edge contributions ``r(src) // outdeg(src)`` where the source rank
   lives (no rank broadcast — at 10^10 nodes the rank vector is
   corpus-scale),
2. re-shard contributions by dst and fold them into the next rank vector.

Ranks are MATERIALIZED once per superstep (object-store blocks, spillable
— the standard persistence point of an iterative dataflow; without it
iteration k re-executes the entire lineage of k-1). The edge table is
materialized once and reused by every superstep.

All arithmetic is integer fixed-point (scale 1e12, damping 85/100 with
floor division), so the result is bit-identical regardless of summation
order, partitioning, or cluster size — and the driver's DuckDB oracle
(the k supersteps unrolled as CTEs over the identical integer ops)
hash-verifies it exactly. The reference has no graph operator; this is a
training-data/link-analysis addition (host authority scoring is the
crawl-side use: rank hosts by who links to whom).

The demo graph is synthesized deterministically from the contiguous
``documents.doc_id`` domain (outdeg(v) = 1 + v % 4, dst = Knuth-hash
successor mod N, self-loops bumped) — the same inject-then-verify pattern
as the PII corpus; a real link table plugs into ``pagerank_edges``'s
place unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from spiderman_ray.pipelines.text import _read_docs, _shard64_of

#: Fixed-point scale: ranks are integers in units of 1e-12.
PR_SCALE = 10**12
#: Damping factor 0.85 as an integer ratio (85 // 100).
PR_DAMP_NUM = 85
#: Knuth multiplicative-hash constant for the synthetic successor edges.
PR_MULT = 2654435761


def pagerank_edges(sf_dir: str, n_nodes: int) -> rd.Dataset:
    """Deterministic synthetic link graph over doc_id in [0, N):
    (src, dst, outdeg) with outdeg(src) = 1 + src % 4 and
    dst = (src * PR_MULT + s) % N for s in 1..outdeg (self-loops bump to
    the next node). Vectorized expansion, no shuffle."""

    def expand(batch: pa.Table) -> pa.Table:
        src = batch["doc_id"].to_numpy().astype(np.int64)
        outdeg = 1 + src % 4
        rep = np.repeat(src, outdeg)
        od = np.repeat(outdeg, outdeg)
        idx = np.arange(len(rep), dtype=np.int64)
        starts = np.repeat(np.cumsum(outdeg) - outdeg, outdeg)
        s = idx - starts + 1
        dst0 = (rep * PR_MULT + s) % n_nodes
        dst = np.where(dst0 == rep, (dst0 + 1) % n_nodes, dst0)
        return pa.table(
            {
                "src": pa.array(rep),
                "dst": pa.array(dst),
                "outdeg": pa.array(od),
                "_sshard": pa.array(_shard64_of(rep.tolist())),
            }
        )

    return _read_docs(sf_dir, columns=("doc_id",)).map_batches(
        expand, batch_format="pyarrow"
    )


def pagerank(sf_dir: str, iters: int = 5) -> rd.Dataset:
    """Integer fixed-point PageRank after ``iters`` synchronous power
    iterations: r'(v) = (15 * (S // N) + 85 * sum_{u->v} r(u) // outdeg(u))
    // 100 with S = 1e12. Output (doc_id, rank_x1e12) — bit-identical to
    the unrolled-CTE SQL oracle for any partitioning."""
    n = _read_docs(sf_dir, columns=("doc_id",)).count()
    teleport = (100 - PR_DAMP_NUM) * (PR_SCALE // n)

    edges = pagerank_edges(sf_dir, n).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        node = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node),
                "r": pa.array(np.full(len(node), PR_SCALE // n, dtype=np.int64)),
            }
        )

    ranks = (
        _read_docs(sf_dir, columns=("doc_id",))
        .map_batches(init_rank, batch_format="pyarrow")
        .materialize()
    )

    # union schema for the src-side co-partition (ints pad with ZEROS —
    # nulls transiting a pandas block widen int64 -> float64)
    def edges_marked(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, dtype=np.int64)
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "outdeg": batch["outdeg"],
                "r": pa.array(z),
                "_is_rank": pa.array(np.zeros(batch.num_rows, dtype=bool)),
                "_shard": batch["_sshard"],
            }
        )

    def ranks_marked(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy().astype(np.int64)
        z = np.zeros(batch.num_rows, dtype=np.int64)
        return pa.table(
            {
                "key": batch["node"],
                "dst": pa.array(z),
                "outdeg": pa.array(z),
                "r": batch["r"],
                "_is_rank": pa.array(np.ones(batch.num_rows, dtype=bool)),
                "_shard": pa.array(_shard64_of(node.tolist())),
            }
        )

    def emit_contribs(g: pd.DataFrame) -> pd.DataFrame:
        is_rank = g["_is_rank"].to_numpy()
        rk = g[is_rank]
        ed = g[~is_rank]
        # every node emits a zero row so sinks keep their teleport mass
        # in the dst-side fold (and the output stays N rows)
        out_dst = [rk["key"].to_numpy(dtype=np.int64)]
        out_c = [np.zeros(len(rk), dtype=np.int64)]
        if len(ed):
            m = ed.drop(columns=["r"]).merge(
                rk[["key", "r"]], on="key", how="left", sort=False
            )
            # synthetic graph: every src is a real node, so r never nulls
            out_dst.append(m["dst"].to_numpy(dtype=np.int64))
            out_c.append(
                m["r"].to_numpy(dtype=np.int64) // m["outdeg"].to_numpy(dtype=np.int64)
            )
        dst = np.concatenate(out_dst)
        c = np.concatenate(out_c)
        return pd.DataFrame(
            {"dst": dst, "c": c, "_dshard": _shard64_of(dst.tolist())}
        )

    def fold_ranks(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("dst", sort=False)["c"].sum()
        node = agg.index.to_numpy(dtype=np.int64)
        r = (teleport + PR_DAMP_NUM * agg.to_numpy(dtype=np.int64)) // 100
        return pd.DataFrame({"node": node, "r": r})

    em = edges.map_batches(edges_marked, batch_format="pyarrow").materialize()
    for _ in range(iters):
        ranks = (
            em.union(ranks.map_batches(ranks_marked, batch_format="pyarrow"))
            .groupby("_shard")
            .map_groups(emit_contribs, batch_format="pandas")
            .groupby("_dshard")
            .map_groups(fold_ranks, batch_format="pandas")
            .materialize()
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["node"], pa.int64()),
                "rank_x1e12": pa.compute.cast(batch["r"], pa.int64()),
            }
        )

    return ranks.map_batches(rename, batch_format="pyarrow")


def pagerank_oracle_sql(iters: int = 5) -> str:
    """The identical integer supersteps unrolled as DuckDB CTEs."""
    s = PR_SCALE
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents), ",
        "nd AS (SELECT doc_id FROM documents), ",
        "ed AS (SELECT doc_id AS src, CAST(1 + doc_id % 4 AS BIGINT) AS outdeg, "
        "unnest(range(1, CAST(2 + doc_id % 4 AS INT))) AS s FROM nd), ",
        "e AS (SELECT src, outdeg, CASE WHEN (src * 2654435761 + s) % nn.n = src "
        "THEN ((src * 2654435761 + s) % nn.n + 1) % nn.n "
        f"ELSE (src * 2654435761 + s) % nn.n END AS dst FROM ed, nn), ",
        f"r0 AS (SELECT doc_id, ({s} // nn.n) AS r FROM nd, nn), ",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS (SELECT nd.doc_id, (15 * ({s} // nn.n) + 85 * "
            f"COALESCE(c.cs, 0)) // 100 AS r FROM nd CROSS JOIN nn LEFT JOIN "
            f"(SELECT e.dst, SUM(rr.r // e.outdeg) AS cs FROM e "
            f"JOIN r{k - 1} rr ON e.src = rr.doc_id GROUP BY e.dst) c "
            f"ON nd.doc_id = c.dst), "
        )
    parts.append(
        f"fin AS (SELECT doc_id, CAST(r AS BIGINT) AS rank_x1e12 FROM r{iters}) "
        "SELECT doc_id, rank_x1e12 FROM fin"
    )
    return "".join(parts)
