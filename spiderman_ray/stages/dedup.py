"""Standalone frontier dedup: deterministic first-wins, sharded seen check.

NOTE: the crawl engine FUSES this logic into the fetch stage
(stages/fetch.py) because the politeness partition already co-locates
duplicates (fp determines host) — one shuffle instead of two. This module
remains the standalone operator for frontiers that are NOT about to be
host-partitioned (e.g. deduplicating a merged seed list before a run).

Reference semantics: dedup happens when a request is scheduled; with FIFO pop
order the EARLIEST-pushed duplicate crawls and later ones drop
(SP/bloom_dupefilter.py:77-83 + Redis list FIFO, SP/utils/ctrl_redis.py:30,69).
Duplicates carry different metadata (fkey/pagenum/px from different parents),
so which duplicate survives is observable — first-wins must be by ``seq``,
not by arrival order.

Two phases per generation:

1. intra-generation: keep the min-``seq`` row per fingerprint. Local
   vectorized pre-dedup inside ``map_batches`` (cheap combiner), then a
   ``groupby('fp')`` shuffle for the global first-wins. This is THE dedup
   exchange; its key (fp = md5 of canonical URL) is uniform by construction,
   so no skew handling is needed here.
2. cross-generation: offer the (now unique) fingerprints to the sharded
   seen-set actor pool — one RPC per shard per batch; the pool both filters
   and records, atomically per shard.

Per-callback opt-out (``dont_filter``, SP/spiders/zhifang.py:55-61): rows
whose callback has dedup disabled bypass BOTH phases and are never added to
the seen set (scrapy never consults the dupefilter for them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.state.seen import ShardedSeenSet


def _local_first_wins(batch: pa.Table) -> pa.Table:
    """Vectorized per-batch combiner: min-seq row per fp."""
    df = batch.to_pandas()
    idx = df.groupby("fp", sort=False)["seq"].idxmin()
    out = pa.Table.from_pandas(df.loc[np.sort(idx.values)], preserve_index=False)
    return out.replace_schema_metadata(None)


#: groupby key granularity: one group PER SHARD (hash64(fp) % N), not per fp —
#: per-group Python dispatch at fp granularity costs milliseconds x millions
#: of groups; per-shard groups stay O(parallelism) and the inner first-wins
#: is one vectorized pandas pass. All rows of an fp land in one shard, so
#: the result is identical.
_DEDUP_SHARDS = 64


def _shard_first_wins(group: pd.DataFrame) -> pd.DataFrame:
    out = group.sort_values(["fp", "seq"]).drop_duplicates("fp", keep="first")
    return out.drop(columns=["_dshard"])


class SeenOffer:
    """map_batches callable offering fingerprints to the shard actors and
    keeping only first-seen rows. Actor handles serialize into tasks."""

    def __init__(self, pool: ShardedSeenSet):
        self.pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        accepted = self.pool.offer(batch.column("fp").to_pylist())
        return batch.filter(pa.array(accepted))


def dedup_frontier(
    frontier: rd.Dataset, pool: ShardedSeenSet, policy: CrawlPolicy
) -> rd.Dataset:
    """Apply both dedup phases; returns the accepted (scheduled) frontier."""
    # the split is decided per row by policy.dedup_for — custom-spec
    # callbacks and overrides are honored without any hardcoded list
    if policy.dedup and not policy.dedup_overrides:
        filtered, bypass = frontier, None
    elif not policy.dedup and not policy.dedup_overrides:
        return frontier
    else:
        def _mask(t: pa.Table, keep: bool) -> pa.Table:
            flags = [policy.dedup_for(cb) == keep for cb in t["callback"].to_pylist()]
            return t.filter(pa.array(flags))

        filtered = frontier.map_batches(
            lambda t: _mask(t, True), batch_format="pyarrow"
        )
        bypass = frontier.map_batches(
            lambda t: _mask(t, False), batch_format="pyarrow"
        )

    def add_shard(t: pa.Table) -> pa.Table:
        from spiderman_ray.functions.hashing import hash64

        sh = hash64(t["fp"].to_pylist()).view(np.uint64) % np.uint64(_DEDUP_SHARDS)
        return t.append_column("_dshard", pa.array(sh.astype(np.int64)))

    deduped = (
        filtered.map_batches(_local_first_wins, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("_dshard")
        .map_groups(_shard_first_wins, batch_format="pandas")
        .map_batches(SeenOffer(pool), batch_format="pyarrow")
    )
    return deduped.union(bypass) if bypass is not None else deduped
