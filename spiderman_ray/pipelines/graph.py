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


def triangle_counts(sf_dir: str) -> rd.Dataset:
    """Per-vertex triangle participation over the undirected synthetic
    graph — the multi-way self-join family. Four bounded exchanges:

    1. canonicalize + dedup edges (a = min, b = max) by edge-pair shard,
    2. group the adjacency by shard(a) and enumerate each vertex's
       out-neighbor pairs (b < c) — wedges, vectorized via the triu
       machinery's run-length shape (per-vertex pandas enumeration here;
       id-ordering matches the SQL oracle's a < b < c contract; the
       degree-orientation variant bounds hub fan-out at real scale),
    3. close wedges against the edge set: co-partition wedges with edges
       by hash of the (b, c) pair (the union-shard bucketed-join shape),
    4. explode each triangle's three ids and fold per-vertex counts.

    Output (doc_id, n_triangles), only vertices in >= 1 triangle —
    exactly the SQL's three-way self-join + unnest + group count.

    Pair keys are encoded a * n + b in int64, which bounds the vertex
    count at n <= floor(sqrt(2^63)) ~= 3.03e9 — guarded loudly below.
    Past that, switch the key to the string-hash shape the other shard
    keys use (membership probe included)."""
    n = _read_docs(sf_dir, columns=("doc_id",)).count()
    if n > 3_037_000_499:  # floor(sqrt(2^63)): a*n+b must stay in int64
        raise OverflowError(
            f"triangle_counts: n={n} vertices overflows the int64 a*n+b "
            "pair key (bound 3_037_000_499); re-encode keys before scaling"
        )

    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.int64)
        dst = batch["dst"].to_numpy().astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "_eshard": pa.array(_shard64_of((a * n + b).tolist())),
            }
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]].assign(
            _ashard=lambda d: _shard64_of(d["a"].tolist())
        )

    edges = (
        pagerank_edges(sf_dir, n)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("_eshard")
        .map_groups(dedup, batch_format="pandas")
        .materialize()
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for a, grp in g.groupby("a", sort=False):
            nb = np.sort(grp["b"].to_numpy(dtype=np.int64))
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            out_a.append(np.full(len(i), a, dtype=np.int64))
            out_b.append(nb[i])
            out_c.append(nb[j])
        if not out_a:
            return pd.DataFrame(
                {"a": [], "b": [], "c": [], "_pshard": []}, dtype=np.int64
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        c = np.concatenate(out_c)
        return pd.DataFrame(
            {"a": a, "b": b, "c": c, "_pshard": _shard64_of((b * n + c).tolist())}
        )

    def edges_as_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # pandas out, to match the wedge stage's block type (a union of
        # mixed arrow/pandas blocks breaks the sort's boundary sampling)
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        z = np.zeros(len(a), dtype=np.int64) - 1  # edge-marker apex
        return pd.DataFrame(
            {"a": z, "b": a, "c": b, "_pshard": _shard64_of((a * n + b).tolist())}
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["a"].to_numpy() == -1
        ew = g[is_edge]
        wd = g[~is_edge]
        if not len(wd) or not len(ew):
            return pd.DataFrame({"v": []}, dtype=np.int64)
        ekeys = set(
            (ew["b"].to_numpy(dtype=np.int64) * n + ew["c"].to_numpy(dtype=np.int64)).tolist()
        )
        wkeys = wd["b"].to_numpy(dtype=np.int64) * n + wd["c"].to_numpy(dtype=np.int64)
        hit = np.isin(wkeys, np.fromiter(ekeys, dtype=np.int64, count=len(ekeys)))
        tri = wd[hit]
        v = np.concatenate(
            [
                tri["a"].to_numpy(dtype=np.int64),
                tri["b"].to_numpy(dtype=np.int64),
                tri["c"].to_numpy(dtype=np.int64),
            ]
        )
        return pd.DataFrame({"v": v})

    def per_vertex(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("v", sort=False).size()
        return pd.DataFrame(
            {
                "doc_id": agg.index.to_numpy(dtype=np.int64),
                "n_triangles": agg.to_numpy().astype(np.int64),
            }
        )

    tri_members = (
        edges.groupby("_ashard")
        .map_groups(wedges, batch_format="pandas")
        .union(edges.map_batches(edges_as_pairs, batch_format="pandas"))
        .groupby("_pshard")
        .map_groups(close, batch_format="pandas")
    )

    def vshard(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy().astype(np.int64)
        if not len(v):  # hash64 on an empty key list has no defined shape
            return pa.table(
                {"v": pa.array([], pa.int64()), "_vshard": pa.array([], pa.int64())}
            )
        return pa.table({"v": pa.array(v), "_vshard": pa.array(_shard64_of(v.tolist()))})

    return (
        tri_members.map_batches(vshard, batch_format="pyarrow")
        .groupby("_vshard")
        .map_groups(per_vertex, batch_format="pandas")
    )


class _PRShard:
    """One BSP shard of the actor-path PageRank: holds its hash-shard of
    the edge table (pre-grouped by destination shard and destination, so
    a superstep's outbox is a reduceat) and its shard of the rank vector.
    State loads ONCE (the actor-pool principle); supersteps exchange only
    pre-combined (dst, contrib) arrays actor-to-actor through the object
    store — the driver touches ObjectRefs, never data."""

    def __init__(self, idx: int, k: int, n: int, teleport: int):
        self.idx, self.k, self.n, self.teleport = idx, k, n, teleport

    def load(self, *tables) -> int:
        from spiderman_ray.functions.hashing import hash64

        t = _concat_or_empty(tables, ("src", "dst", "outdeg"))
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        outdeg = t["outdeg"].to_numpy().astype(np.int64)
        # my nodes: contiguous doc_id domain filtered to this hash shard
        # (a real link table would load its node partition instead)
        allv = np.arange(self.n, dtype=np.int64)
        mine = (hash64([str(v) for v in allv]).view(np.uint64) % np.uint64(self.k)).astype(np.int64) == self.idx
        self.nodes = allv[mine]
        self.r = np.full(len(self.nodes), (10**12) // self.n, dtype=np.int64)
        # order edges by (dst_shard, dst): outbox segments are slices and
        # same-dst pre-combination is one reduceat over run boundaries
        dsh = (hash64([str(v) for v in dst]).view(np.uint64) % np.uint64(self.k)).astype(np.int64)
        order = np.lexsort((dst, dsh))
        self.src_pos = np.searchsorted(self.nodes, src[order])
        self.outdeg = outdeg[order]
        d_sorted, dsh_sorted = dst[order], dsh[order]
        runs = np.flatnonzero(
            np.diff(d_sorted, prepend=d_sorted[0] - 1)
            | np.diff(dsh_sorted, prepend=dsh_sorted[0] - 1)
        ) if len(d_sorted) else np.array([], dtype=np.int64)
        self.run_starts = runs
        self.run_dst = d_sorted[runs] if len(runs) else d_sorted[:0]
        run_shard = dsh_sorted[runs] if len(runs) else dsh_sorted[:0]
        # contiguous [start, end) run-index ranges per destination shard
        self.shard_ranges = [
            (np.searchsorted(run_shard, j), np.searchsorted(run_shard, j + 1))
            for j in range(self.k)
        ]
        return len(self.nodes)

    def contribs(self):
        c = self.r[self.src_pos] // self.outdeg
        sums = np.add.reduceat(c, self.run_starts) if len(self.run_starts) else c[:0]
        out = []
        for lo, hi in self.shard_ranges:
            out.append((self.run_dst[lo:hi], sums[lo:hi]))
        return tuple(out) if self.k > 1 else out[0]

    def apply(self, *inbox) -> int:
        acc = np.zeros(len(self.nodes), dtype=np.int64)
        for dst, c in inbox:
            if len(dst):
                np.add.at(acc, np.searchsorted(self.nodes, dst), c)
        self.r = (self.teleport + 85 * acc) // 100
        return 0

    def ranks(self) -> pa.Table:
        return pa.table(
            {"doc_id": pa.array(self.nodes), "rank_x1e12": pa.array(self.r)}
        )


def pagerank_bsp(sf_dir: str, iters: int = 5, k: int | None = None) -> rd.Dataset:
    """Actor-held-shard BSP PageRank — bit-identical to ``pagerank``
    (integer ops are associative) but without the per-superstep Dataset
    exchange constant: edges shard ONCE into k actors (one sort + an
    O(k) split), then each superstep is one round of pre-combined
    (dst, contrib) messages between actors via the object store
    (``num_returns=k`` point-to-point; the driver only routes refs).
    This is the documented case where the Dataset API genuinely cannot
    express the semantics cheaply: iterative supersteps over persistent
    partitioned state. ~10x less per-superstep latency than the Dataset
    path at small scale; same asymptotics at large."""
    import ray

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines import pool_size

    n = _read_docs(sf_dir, columns=("doc_id",)).count()
    k = k or pool_size(8)
    teleport = (100 - PR_DAMP_NUM) * (PR_SCALE // n)

    def add_bshard(batch: pa.Table) -> pa.Table:
        sh = (
            hash64([str(v) for v in batch["src"].to_pylist()]).view(np.uint64)
            % np.uint64(k)
        ).astype(np.int64)
        return batch.append_column("_bshard", pa.array(sh))

    ed = (
        pagerank_edges(sf_dir, n)
        .drop_columns(["_sshard"])
        .map_batches(add_bshard, batch_format="pyarrow")
        .sort("_bshard")
        .materialize()
    )
    counts = {r["_bshard"]: r["count()"] for r in ed.groupby("_bshard").count().take_all()}
    cuts = np.cumsum([counts.get(j, 0) for j in range(k)])[:-1].tolist()
    splits = ed.split_at_indices(cuts)

    Shard = ray.remote(_PRShard)
    actors = [Shard.remote(i, k, n, teleport) for i in range(k)]
    ray.get([
        a.load.remote(*splits[i].to_arrow_refs())
        for i, a in enumerate(actors)
    ])
    for _ in range(iters):
        if k > 1:
            outs = [a.contribs.options(num_returns=k).remote() for a in actors]
            ray.get([
                actors[j].apply.remote(*[outs[i][j] for i in range(k)])
                for j in range(k)
            ])
        else:
            out = actors[0].contribs.remote()
            ray.get(actors[0].apply.remote(out))
    tables = [a.ranks.remote() for a in actors]
    return rd.from_arrow_refs(tables)


class _CCShard:
    """BSP shard for min-label connected components: same construction as
    ``_PRShard`` but messages carry labels, the per-run pre-combine is a
    ``minimum.reduceat``, and ``apply`` reports how many of this shard's
    labels moved (the O(k) convergence probe)."""

    def __init__(self, idx: int, k: int, n: int):
        self.idx, self.k, self.n = idx, k, n

    def load(self, *tables) -> int:
        from spiderman_ray.functions.hashing import hash64

        t = _concat_or_empty(tables, ("src", "dst"))
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        allv = np.arange(self.n, dtype=np.int64)
        mine = (hash64([str(v) for v in allv]).view(np.uint64) % np.uint64(self.k)).astype(np.int64) == self.idx
        self.nodes = allv[mine]
        self.lbl = self.nodes.copy()
        dsh = (hash64([str(v) for v in dst]).view(np.uint64) % np.uint64(self.k)).astype(np.int64)
        order = np.lexsort((dst, dsh))
        self.src_pos = np.searchsorted(self.nodes, src[order])
        d_sorted, dsh_sorted = dst[order], dsh[order]
        runs = np.flatnonzero(
            np.diff(d_sorted, prepend=d_sorted[0] - 1)
            | np.diff(dsh_sorted, prepend=dsh_sorted[0] - 1)
        ) if len(d_sorted) else np.array([], dtype=np.int64)
        self.run_starts = runs
        self.run_dst = d_sorted[runs] if len(runs) else d_sorted[:0]
        run_shard = dsh_sorted[runs] if len(runs) else dsh_sorted[:0]
        self.shard_ranges = [
            (np.searchsorted(run_shard, j), np.searchsorted(run_shard, j + 1))
            for j in range(self.k)
        ]
        return len(self.nodes)

    def messages(self):
        m = self.lbl[self.src_pos]
        mins = np.minimum.reduceat(m, self.run_starts) if len(self.run_starts) else m[:0]
        out = [(self.run_dst[lo:hi], mins[lo:hi]) for lo, hi in self.shard_ranges]
        return tuple(out) if self.k > 1 else out[0]

    def apply(self, *inbox) -> int:
        new = self.lbl.copy()
        for dst, m in inbox:
            if len(dst):
                pos = np.searchsorted(self.nodes, dst)
                np.minimum.at(new, pos, m)
        changed = int((new != self.lbl).sum())
        self.lbl = new
        return changed

    def labels(self) -> pa.Table:
        return pa.table(
            {"doc_id": pa.array(self.nodes), "component": pa.array(self.lbl)}
        )


def connected_components_bsp(
    sf_dir: str, max_iters: int = 256, k: int | None = None
) -> rd.Dataset:
    """Actor-held-shard BSP connected components — bit-identical to the
    Dataset-exchange ``connected_components`` (min is associative), with
    the per-superstep exchange constant removed and convergence decided
    from the k per-shard changed-counts (O(k) ints to the driver)."""
    import ray

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines import pool_size

    n = _read_docs(sf_dir, columns=("doc_id",)).count()
    k = k or pool_size(8)

    def canon_both(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.int64)
        dst = batch["dst"].to_numpy().astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a = np.concatenate([src, dst])
        b = np.concatenate([dst, src])
        sh = (hash64([str(v) for v in a]).view(np.uint64) % np.uint64(k)).astype(np.int64)
        return pa.table(
            {"src": pa.array(a), "dst": pa.array(b), "_bshard": pa.array(sh)}
        )

    ed = (
        pagerank_edges(sf_dir, n)
        .drop_columns(["_sshard"])
        .map_batches(canon_both, batch_format="pyarrow")
        .sort("_bshard")
        .materialize()
    )
    counts = {r["_bshard"]: r["count()"] for r in ed.groupby("_bshard").count().take_all()}
    cuts = np.cumsum([counts.get(j, 0) for j in range(k)])[:-1].tolist()
    splits = ed.split_at_indices(cuts)

    Shard = ray.remote(_CCShard)
    actors = [Shard.remote(i, k, n) for i in range(k)]
    ray.get([
        a.load.remote(*splits[i].to_arrow_refs()) for i, a in enumerate(actors)
    ])
    _bsp_converge(actors, k, max_iters, "connected_components_bsp")
    return rd.from_arrow_refs([a.labels.remote() for a in actors])


def _bsp_converge(actors, k: int, max_iters: int, op_name: str) -> int:
    """Run BSP supersteps until no shard reports a change and return the
    number of STATE-CHANGING supersteps (the convergence depth). RAISES
    if ``max_iters`` exhausts first — a silent fall-out would return
    non-converged labels/distances that only surface later as an opaque
    driver-gate hash mismatch (round-3 ADVICE)."""
    import ray

    for it in range(max_iters):
        if k > 1:
            outs = [a.messages.options(num_returns=k).remote() for a in actors]
            changed = ray.get([
                actors[j].apply.remote(*[outs[i][j] for i in range(k)])
                for j in range(k)
            ])
        else:
            out = actors[0].messages.remote()
            changed = [ray.get(actors[0].apply.remote(out))]
        if sum(changed) == 0:
            return it
    raise RuntimeError(
        f"{op_name}: BSP loop exhausted max_iters={max_iters} before the "
        "fixpoint — refusing to return non-converged state"
    )


#: Unreachable sentinel for SSSP (2^62: INF + max weight stays in int64).
_SSSP_INF = 1 << 62

#: Relaxation rounds unrolled by the DuckDB oracle. sssp() asserts its
#: measured convergence depth stays within this bound, so a scale factor
#: or graph whose shortest-path-tree depth exceeds the unroll fails
#: LOUDLY in the engine instead of silently diverging at the gate.
_SSSP_ORACLE_ROUNDS = 24


def _concat_or_empty(tables, cols: tuple) -> pa.Table:
    """Concat an actor's split blocks; a shard can legally receive ZERO
    rows (sparse graph / high k) and pa.concat_tables([]) raises."""
    tabs = [tb for tb in tables if tb.num_rows]
    if tabs:
        return pa.concat_tables(tabs)
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


class _SSSPShard:
    """BSP shard for single-source shortest paths: the min-plus sibling of
    ``_CCShard`` — messages carry dist(src) + w(edge), pre-combined per
    destination run by ``minimum.reduceat``; ``apply`` folds min and
    reports changed counts."""

    def __init__(self, idx: int, k: int, n: int, source: int):
        self.idx, self.k, self.n, self.source = idx, k, n, source

    def load(self, *tables) -> int:
        from spiderman_ray.functions.hashing import hash64

        t = _concat_or_empty(tables, ("src", "dst", "w"))
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        w = t["w"].to_numpy().astype(np.int64)
        allv = np.arange(self.n, dtype=np.int64)
        mine = (hash64([str(v) for v in allv]).view(np.uint64) % np.uint64(self.k)).astype(np.int64) == self.idx
        self.nodes = allv[mine]
        self.dist = np.full(len(self.nodes), _SSSP_INF, dtype=np.int64)
        at = np.searchsorted(self.nodes, self.source)
        if at < len(self.nodes) and self.nodes[at] == self.source:
            self.dist[at] = 0
        dsh = (hash64([str(v) for v in dst]).view(np.uint64) % np.uint64(self.k)).astype(np.int64)
        order = np.lexsort((dst, dsh))
        self.src_pos = np.searchsorted(self.nodes, src[order])
        self.w = w[order]
        d_sorted, dsh_sorted = dst[order], dsh[order]
        runs = np.flatnonzero(
            np.diff(d_sorted, prepend=d_sorted[0] - 1)
            | np.diff(dsh_sorted, prepend=dsh_sorted[0] - 1)
        ) if len(d_sorted) else np.array([], dtype=np.int64)
        self.run_starts = runs
        self.run_dst = d_sorted[runs] if len(runs) else d_sorted[:0]
        run_shard = dsh_sorted[runs] if len(runs) else dsh_sorted[:0]
        self.shard_ranges = [
            (np.searchsorted(run_shard, j), np.searchsorted(run_shard, j + 1))
            for j in range(self.k)
        ]
        return len(self.nodes)

    def messages(self):
        m = self.dist[self.src_pos] + self.w
        mins = np.minimum.reduceat(m, self.run_starts) if len(self.run_starts) else m[:0]
        out = [(self.run_dst[lo:hi], mins[lo:hi]) for lo, hi in self.shard_ranges]
        return tuple(out) if self.k > 1 else out[0]

    def apply(self, *inbox) -> int:
        new = self.dist.copy()
        for dst, m in inbox:
            if len(dst):
                np.minimum.at(new, np.searchsorted(self.nodes, dst), m)
        changed = int((new != self.dist).sum())
        self.dist = new
        return changed

    def dists(self) -> pa.Table:
        d = np.where(self.dist >= _SSSP_INF, np.int64(-1), self.dist)
        return pa.table({"doc_id": pa.array(self.nodes), "dist": pa.array(d)})


def sssp(sf_dir: str, source: int = 0, max_iters: int = 256,
         k: int | None = None) -> rd.Dataset:
    """Single-source shortest paths over the weighted undirected synthetic
    graph (w(u,v) = 1 + (u+v) % 5): distributed Bellman-Ford on the BSP
    actor shards — each superstep relaxes every edge once via min-plus
    messages, converging in O(shortest-path-tree depth) supersteps
    (measured 10-14 on this graph). Integer min-plus is associative, so
    the distance vector is bit-identical under any partitioning; the
    DuckDB oracle unrolls 24 relaxation rounds (> the measured depth) as
    CTEs. Unreachable nodes report -1. Output (doc_id, dist)."""
    import ray

    from spiderman_ray.functions.hashing import hash64
    from spiderman_ray.pipelines import pool_size

    n = _read_docs(sf_dir, columns=("doc_id",)).count()
    k = k or pool_size(8)

    def weighted_both(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.int64)
        dst = batch["dst"].to_numpy().astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        w = 1 + (src + dst) % 5
        a = np.concatenate([src, dst])
        b = np.concatenate([dst, src])
        ww = np.concatenate([w, w])
        sh = (hash64([str(v) for v in a]).view(np.uint64) % np.uint64(k)).astype(np.int64)
        return pa.table(
            {"src": pa.array(a), "dst": pa.array(b), "w": pa.array(ww),
             "_bshard": pa.array(sh)}
        )

    ed = (
        pagerank_edges(sf_dir, n)
        .drop_columns(["_sshard"])
        .map_batches(weighted_both, batch_format="pyarrow")
        .sort("_bshard")
        .materialize()
    )
    counts = {r["_bshard"]: r["count()"] for r in ed.groupby("_bshard").count().take_all()}
    cuts = np.cumsum([counts.get(j, 0) for j in range(k)])[:-1].tolist()
    splits = ed.split_at_indices(cuts)

    Shard = ray.remote(_SSSPShard)
    actors = [Shard.remote(i, k, n, source) for i in range(k)]
    ray.get([
        a.load.remote(*splits[i].to_arrow_refs()) for i, a in enumerate(actors)
    ])
    depth = _bsp_converge(actors, k, max_iters, "sssp")
    if depth > _SSSP_ORACLE_ROUNDS:
        raise RuntimeError(
            f"sssp: converged after {depth} relaxation rounds, but the "
            f"DuckDB oracle unrolls only {_SSSP_ORACLE_ROUNDS} — the pinned "
            "SQL would encode non-converged distances (raise the unroll)"
        )
    return rd.from_arrow_refs([a.dists.remote() for a in actors])


def sssp_oracle_sql(rounds: int = _SSSP_ORACLE_ROUNDS) -> str:
    """Bellman-Ford unrolled as CTEs over the identical weighted edges."""
    inf = _SSSP_INF
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents), "
        "nd AS (SELECT doc_id FROM documents), "
        "ed AS (SELECT doc_id AS src, "
        "unnest(range(1, CAST(2 + doc_id % 4 AS INT))) AS s FROM nd), "
        "e0 AS (SELECT src, CASE WHEN (src * 2654435761 + s) % nn.n = src "
        "THEN ((src * 2654435761 + s) % nn.n + 1) % nn.n "
        "ELSE (src * 2654435761 + s) % nn.n END AS dst FROM ed, nn), "
        "w0 AS (SELECT DISTINCT src, dst, 1 + (src + dst) % 5 AS w "
        "FROM e0 WHERE src <> dst), "
        "ue AS (SELECT src AS u, dst AS v, w FROM w0 "
        "UNION SELECT dst, src, w FROM w0), "
        f"d0 AS (SELECT doc_id AS node, CASE WHEN doc_id = 0 THEN 0 "
        f"ELSE {inf} END AS d FROM nd), ",
    ]
    for r in range(1, rounds + 1):
        # MATERIALIZED: each round references its predecessor twice, and
        # DuckDB inlines plain CTEs — without the hint the plan is 2^rounds
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT x.node, "
            f"LEAST(x.d, COALESCE(m.md, x.d)) AS d "
            f"FROM d{r - 1} x LEFT JOIN (SELECT ue.v AS node, "
            f"MIN(dp.d + ue.w) AS md FROM d{r - 1} dp JOIN ue ON ue.u = dp.node "
            f"WHERE dp.d < {inf} GROUP BY ue.v) m ON x.node = m.node), "
        )
    parts.append(
        f"fin AS (SELECT node, CASE WHEN d >= {inf} THEN -1 ELSE d END AS d "
        f"FROM d{rounds}) "
        "SELECT node AS doc_id, CAST(d AS BIGINT) AS dist FROM fin"
    )
    return "".join(parts)


def connected_components(sf_dir: str, max_iters: int = 64) -> rd.Dataset:
    """Min-label connected components over the undirected synthetic graph
    — the generic sibling of the dedup family's component machinery
    (text._cc_losers / images._phash_member_clusters_ds label the
    MinHash/pHash pair graphs; this labels an explicit edge table).

    Synchronous label propagation: every vertex starts as its own label;
    each superstep co-partitions edges with current labels by shard(src)
    (labels priced where the vertex lives — no label-map broadcast),
    sends each vertex's label across its edges both ways, and folds
    min(own, incoming) per vertex. Converges in O(component diameter)
    supersteps; the loop stops when a superstep changes nothing (the
    change count is an O(1) driver aggregate, not a collect). Integer
    min is associative — bit-identical for any partitioning. Output:
    (doc_id, component) with component = min doc_id reachable."""
    n = _read_docs(sf_dir, columns=("doc_id",)).count()

    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.int64)
        dst = batch["dst"].to_numpy().astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        # both directions: label flows each way along an undirected edge
        a = np.concatenate([src, dst])
        b = np.concatenate([dst, src])
        return pa.table(
            {
                "key": pa.array(a),
                "dst": pa.array(b),
                "lbl": pa.array(np.zeros(len(a), dtype=np.int64)),
                "_is_lbl": pa.array(np.zeros(len(a), dtype=bool)),
                "_shard": pa.array(_shard64_of(a.tolist())),
            }
        )

    edges = pagerank_edges(sf_dir, n).map_batches(
        canon, batch_format="pyarrow"
    ).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        v = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(v), "lbl": pa.array(v)})

    labels = (
        _read_docs(sf_dir, columns=("doc_id",))
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )

    def labels_marked(batch: pa.Table) -> pa.Table:
        v = batch["node"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "key": pa.array(v),
                "dst": pa.array(v),  # self-message keeps the own label
                "lbl": batch["lbl"],
                "_is_lbl": pa.array(np.ones(len(v), dtype=bool)),
                "_shard": pa.array(_shard64_of(v.tolist())),
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        is_lbl = g["_is_lbl"].to_numpy()
        lb = g[is_lbl]
        ed = g[~is_lbl]
        out_dst = [lb["dst"].to_numpy(dtype=np.int64)]
        out_lbl = [lb["lbl"].to_numpy(dtype=np.int64)]
        if len(ed):
            m = ed.drop(columns=["lbl"]).merge(
                lb[["key", "lbl"]], on="key", how="left", sort=False
            )
            out_dst.append(m["dst"].to_numpy(dtype=np.int64))
            out_lbl.append(m["lbl"].to_numpy(dtype=np.int64))
        dst = np.concatenate(out_dst)
        lbl = np.concatenate(out_lbl)
        return pd.DataFrame(
            {"dst": dst, "lbl": lbl, "_dshard": _shard64_of(dst.tolist())}
        )

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("dst", sort=False)["lbl"].min()
        return pd.DataFrame(
            {
                "node": agg.index.to_numpy(dtype=np.int64),
                "lbl": agg.to_numpy(dtype=np.int64),
            }
        )

    converged = False
    for _ in range(max_iters):
        nxt = (
            edges.union(labels.map_batches(labels_marked, batch_format="pyarrow"))
            .groupby("_shard")
            .map_groups(send, batch_format="pandas")
            .groupby("_dshard")
            .map_groups(fold_min, batch_format="pandas")
            .materialize()
        )
        # O(1) convergence probe: total label mass strictly decreases
        # until the fixpoint (labels only ever move down to the min)
        if nxt.sum("lbl") == labels.sum("lbl"):
            labels = nxt
            converged = True
            break
        labels = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components: label propagation exhausted "
            f"max_iters={max_iters} before the fixpoint — refusing to "
            "return non-converged labels (round-3 ADVICE)"
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["node"], pa.int64()),
                "component": pa.compute.cast(batch["lbl"], pa.int64()),
            }
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def connected_components_oracle_sql() -> str:
    """Recursive min-label reachability over the identical synthetic
    undirected edges (component = min reachable doc_id)."""
    return (
        "WITH RECURSIVE nn AS (SELECT COUNT(*) AS n FROM documents), "
        "nd AS (SELECT doc_id FROM documents), "
        "ed AS (SELECT doc_id AS src, "
        "unnest(range(1, CAST(2 + doc_id % 4 AS INT))) AS s FROM nd), "
        "e0 AS (SELECT src, CASE WHEN (src * 2654435761 + s) % nn.n = src "
        "THEN ((src * 2654435761 + s) % nn.n + 1) % nn.n "
        "ELSE (src * 2654435761 + s) % nn.n END AS dst FROM ed, nn), "
        "ue AS (SELECT src AS a, dst AS b FROM e0 WHERE src <> dst "
        "UNION SELECT dst, src FROM e0 WHERE src <> dst), "
        "reach AS (SELECT doc_id AS node, doc_id AS m FROM nd "
        "UNION SELECT ue.b AS node, reach.m FROM reach JOIN ue ON ue.a = reach.node "
        "WHERE reach.m < ue.b) "
        "SELECT node AS doc_id, CAST(MIN(m) AS BIGINT) AS component "
        "FROM reach GROUP BY node"
    )


def triangle_counts_oracle_sql() -> str:
    """Exact three-way self-join over the canonical undirected edges of
    the identical synthetic graph, then unnest the three member ids."""
    return (
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents), "
        "nd AS (SELECT doc_id FROM documents), "
        "ed AS (SELECT doc_id AS src, "
        "unnest(range(1, CAST(2 + doc_id % 4 AS INT))) AS s FROM nd), "
        "e0 AS (SELECT src, CASE WHEN (src * 2654435761 + s) % nn.n = src "
        "THEN ((src * 2654435761 + s) % nn.n + 1) % nn.n "
        "ELSE (src * 2654435761 + s) % nn.n END AS dst FROM ed, nn), "
        "ue AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM e0 WHERE src <> dst), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM ue e1 "
        "JOIN ue e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b), "
        "m AS (SELECT unnest([x, y, z]) AS doc_id FROM tri) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles "
        "FROM m GROUP BY doc_id"
    )


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
