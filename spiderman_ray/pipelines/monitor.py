"""Streaming row monitor — the Kafka consumer analog (kafka_mon.py:17-29).

The reference tails the item stream from Kafka and applies a per-message
predicate (price regex < 8000). Here the monitor is a vectorized filter
stage over a crawled table (streaming through blocks, not materialized):
the same predicate surface, minus the broker.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from spiderman_ray.sources.table_io import read_dataset


def _crawl_table_ds(out_dir: str, table: str) -> rd.Dataset:
    """Stream a gen-partitioned crawl table (tables/<t>/gen=N/part-*.parquet)
    as a Dataset. Falls back to an empty in-memory table (schema preserved)
    when no parts exist, so aggregates over fresh/dead-letter-free runs work."""
    import os

    base = os.path.join(out_dir, "tables", table)
    files: list[str] = []
    if os.path.isdir(base):
        for gen in sorted(os.listdir(base)):
            gd = os.path.join(base, gen)
            if gen.startswith("gen=") and os.path.isdir(gd):
                files.extend(
                    os.path.join(gd, f)
                    for f in sorted(os.listdir(gd))
                    if f.endswith(".parquet")
                )
    if not files:
        from spiderman_ray.engine import read_table_all_gens

        return rd.from_arrow(read_table_all_gens(out_dir, table))
    return rd.read_parquet(files)


def crawl_host_stats(out_dir: str) -> rd.Dataset:
    """Per-host crawl metrics (the frontier-gauge / metrics surface,
    SP_JOBS/job.py:113,135-139, aggregated per host): fetched rows, total
    simulated attempts (including those consumed by dead letters), the
    politeness-vclock high-water mark, and dead-letter count.

    ONE shuffle: crawl_order and dead_letters are mapped into a common
    partial-stats schema, unioned, and aggregated by host. Hosts are
    O(parallelism) by construction (groupby-key invariant), and vts is
    integerized (floor(ms*1000+0.5) microseconds) so the driver hash is
    float-repr-proof."""
    import numpy as np

    from ray.data.aggregate import Max, Sum

    def conv_order(batch: pa.Table) -> pa.Table:
        vts_us = np.floor(batch["vts_ms"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5)
        n = batch.num_rows
        return pa.table(
            {
                "host": batch["host"],
                "_fetched": pa.array(np.ones(n, dtype=np.int64)),
                "_attempts": pc.cast(batch["attempts"], pa.int64()),
                "_vts_us": pa.array(vts_us.astype(np.int64)),
                "_dead": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def conv_dead(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table(
            {
                "host": batch["host"],
                "_fetched": z,
                "_attempts": pc.cast(batch["attempts"], pa.int64()),
                "_vts_us": z,
                "_dead": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    order = _crawl_table_ds(out_dir, "crawl_order").map_batches(
        conv_order, batch_format="pyarrow"
    )
    dead = _crawl_table_ds(out_dir, "dead_letters").map_batches(
        conv_dead, batch_format="pyarrow"
    )
    return order.union(dead).groupby("host").aggregate(
        Sum("_fetched", alias_name="n_fetched"),
        Sum("_attempts", alias_name="attempts_total"),
        Max("_vts_us", alias_name="vts_max_us"),
        Sum("_dead", alias_name="n_dead"),
    )


def price_monitor(pages_uri: str, threshold: int = 5000) -> rd.Dataset:
    """Pages whose numeric price is below ``threshold`` — the
    kafka_mon predicate (price < 8000, kafka_mon.py:22-29) as a streaming
    filter over the pages table."""

    def flt(batch: pa.Table) -> pa.Table:
        price = pc.cast(batch["price"], pa.int64())
        keep = pc.less(price, pa.scalar(threshold))
        return batch.filter(keep).select(["pkey", "title", "price", "pagenum"])

    return read_dataset(pages_uri).map_batches(flt, batch_format="pyarrow")


def crawl_lineage_stats(out_dir: str) -> rd.Dataset:
    """Per-seed lineage analytics over crawl_order: every crawled URL's
    ROOT SEED is recoverable in closed form from the frontier's seq
    encoding (child seq = parent_seq * 2^20 + child_idx, schemas.FRONTIER
    — so root = seq >> 20*generation, no iterative parent join even at
    10^10 rows). One pre-combined groupby on the O(#seeds) root key, then
    the tiny gen-0 (seed_seq -> url) map is broadcast for labeling.
    Output: (seed_url, n_urls, max_depth) — how much crawl each seed
    ultimately produced and how deep it went; the oracle is a VALUES pin
    recomputed sequentially by the reference-loop simulator."""
    import numpy as np
    import ray

    from ray.data.aggregate import Max, Sum

    def roots(batch: pa.Table) -> pa.Table:
        seq = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        gen = batch["generation"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "root": pa.array(seq >> (20 * gen)),
                "n": pa.array(np.ones(len(seq), dtype=np.int64)),
                "depth": pa.array(gen),
            }
        )

    order = _crawl_table_ds(out_dir, "crawl_order")
    seeds = {
        int(r["seq"]): r["url"]
        for b in order.map_batches(
            lambda t: t.filter(pc.equal(t["generation"], 0)).select(["seq", "url"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    seeds_ref = ray.put(seeds)

    def label(batch: pa.Table) -> pa.Table:
        m = ray.get(seeds_ref)
        return pa.table(
            {
                "seed_url": pa.array([m[int(r)] for r in batch["root"].to_pylist()]),
                "n_urls": batch["n"],
                "max_depth": pc.cast(batch["depth"], pa.int64()),
            }
        )

    return (
        order.map_batches(roots, batch_format="pyarrow")
        .groupby("root")
        .aggregate(Sum("n", alias_name="n"), Max("depth", alias_name="depth"))
        .map_batches(label, batch_format="pyarrow")
    )


def crawl_host_authority(out_dir: str, iters: int = 5) -> pa.Table:
    """Host authority: integer fixed-point PageRank over the crawl's REAL
    fetch-lineage graph — the crawl-side use of the graph family
    (pipelines/graph.py). Edges come straight from the frontier's seq
    encoding (child seq = parent_seq * 2^20 + idx, schemas.FRONTIER): a
    child fetched in generation g links its parent fetch (g-1,
    seq >> 20) — so host(parent) -> host(child) edges fall out of ONE
    co-partitioned self-join of crawl_order by parent-fetch key, no URL
    parsing, no link re-extraction. The per-pair multiplicities reduce
    shard-side to an O(hosts^2) aggregate (hosts, not URLs, are the
    nodes — aggregate-sized by nature), and the power iteration runs on
    that tiny weighted graph with the same integer contract as
    graph.pagerank: r'(v) = (15*(S//H) + 85 * sum_u r(u)*c(u,v)//C(u))
    // 100, S = 1e12. Output: (host, rank_x1e12), hostless when the
    crawl had a single generation."""
    import numpy as np
    import pandas as pd

    from spiderman_ray.functions.hashing import hash64

    order = _crawl_table_ds(out_dir, "crawl_order")

    def mark(batch: pa.Table) -> pa.Table:
        import numpy as _np

        seq = batch["seq"].to_numpy(zero_copy_only=False).astype(_np.int64)
        gen = batch["generation"].to_numpy(zero_copy_only=False).astype(_np.int64)
        host = batch["host"].to_pylist()
        # every fetch is a potential PARENT under key (gen, seq); every
        # gen>=1 fetch is also a CHILD under key (gen-1, seq >> 20)
        pk = [f"{g}|{s}" for g, s in zip(gen, seq)]
        ck = [f"{g - 1}|{s >> 20}" for g, s in zip(gen, seq)]
        keys = pk + [k for k, g in zip(ck, gen) if g >= 1]
        hosts = host + [h for h, g in zip(host, gen) if g >= 1]
        is_child = [False] * len(pk) + [True] * (len(keys) - len(pk))
        sh = (hash64(keys).view(_np.uint64) % _np.uint64(64)).astype(_np.int64)
        return pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "_is_child": pa.array(is_child),
                "_kshard": pa.array(sh),
            }
        )

    def edges(g: "pd.DataFrame") -> "pd.DataFrame":
        ch = g[g["_is_child"].to_numpy()]
        pr = g[~g["_is_child"].to_numpy()]
        if not len(ch) or not len(pr):
            return pd.DataFrame({"src": [], "dst": [], "n": []})
        m = ch.merge(
            pr[["k", "host"]].rename(columns={"host": "src"}), on="k", sort=False
        )
        agg = m.groupby(["src", "host"], sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {"src": agg["src"], "dst": agg["host"], "n": agg["n"].astype(np.int64)}
        )

    pairs = (
        order.map_batches(mark, batch_format="pyarrow")
        .groupby("_kshard")
        .map_groups(edges, batch_format="pandas")
        .to_pandas()  # O(hosts^2) rows by construction
    )
    pairs = pairs.groupby(["src", "dst"], sort=False)["n"].sum().reset_index()
    hosts = sorted(set(order.unique("host")))
    return _host_pagerank(pairs, hosts, iters)


def _host_pagerank(pairs, hosts: list, iters: int) -> pa.Table:
    """Shared integer power iteration over the (tiny) weighted host graph
    — engine and the VALUES-pin oracle recompute both call THIS."""
    import numpy as np

    scale = 10**12
    h = len(hosts)
    idx = {x: i for i, x in enumerate(hosts)}
    # object dtype = Python bigints: r[u] (~1e12) * c[u] overflows int64
    # once a host pair carries > ~9.2e6 edges — plausible between two large
    # hosts on a real crawl. The matrix is O(hosts^2) tiny, so exact
    # arbitrary-precision arithmetic costs nothing and keeps engine/oracle
    # parity (identical values wherever int64 didn't overflow).
    c = np.zeros((h, h), dtype=object)
    for s, d, n in zip(pairs["src"], pairs["dst"], pairs["n"]):
        c[idx[s], idx[d]] += int(n)
    out_tot = c.sum(axis=1)
    r = np.full(h, scale // h, dtype=object)
    teleport = 15 * (scale // h)
    for _ in range(iters):
        acc = np.zeros(h, dtype=object)
        for u in range(h):
            if out_tot[u]:
                acc += r[u] * c[u] // out_tot[u]
            else:
                pass  # dangling hosts keep only teleport mass (leaf CDNs)
        r = (teleport + 85 * acc) // 100
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "rank_x1e12": pa.array([int(x) for x in r], pa.int64()),
        }
    )
