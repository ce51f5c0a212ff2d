"""Patch job: re-crawl anything scheduled but absent from the sinks.

The reference's incremental repair model (SP_JOBS/zhifang_job_patch.py):
*the output tables are the checkpoint; the frontier is reconstructed by
anti-join* — missing pages by set difference (:28-51), missing details by
``list LEFT JOIN detail ... WHERE keyid IS NULL`` (:53-76), and the patch
run clears the dupefilter first (SPJob.delete, SP_JOBS/job.py:76-77) so
residual requests are not dropped as already-seen.

Ours generalizes: for every generation, residual = checkpointed frontier
rows whose fingerprint appears in NEITHER crawl_order NOR dead_letters for
that generation. Residuals run through the normal fetch+parse stages with a
FRESH seen pool (intra-residual first-wins only — the delete-dupefilter
semantics); newly parsed children are APPENDED to the next generation's
frontier checkpoint, so losses discovered at depth k repair depth k+1 too.

Scale note: the anti-join materializes only fingerprints (32-byte strings)
driver-side at test scale; at 10^10 the same anti-join runs as a broadcast
bloom-of-done-fps filter inside map_batches, or a bucketed hash join.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from spiderman_ray import schemas
from spiderman_ray.engine import CrawlEngine, _gen_dir, _read_gen_table
from spiderman_ray.stages.fetch import FetchGroup
from spiderman_ray.stages.parse_sink import make_parse_sink, write_part
from spiderman_ray.state.seen import ShardedSeenSet


def _frontier_table(out: str, g: int) -> pa.Table:
    d = _gen_dir(out, "frontier", g)
    if not os.path.isdir(d):
        return schemas.empty(schemas.FRONTIER)
    parts = [
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return pa.concat_tables(parts) if parts else schemas.empty(schemas.FRONTIER)


def find_residual(out: str, g: int, done_prior: set | None = None) -> pa.Table:
    """Frontier rows of generation g with no crawl_order/dead_letters row in
    ANY generation <= g (a cross-generation duplicate that was correctly
    dedup-dropped must not be treated as residual)."""
    frontier = _frontier_table(out, g)
    done = set(done_prior or ())
    done |= set(_read_gen_table(out, "crawl_order", g)["fp"].to_pylist())
    done |= set(_read_gen_table(out, "dead_letters", g)["fp"].to_pylist())
    if done_prior is None:  # standalone call: collect earlier generations
        for gg in range(g):
            done |= set(_read_gen_table(out, "crawl_order", gg)["fp"].to_pylist())
            done |= set(_read_gen_table(out, "dead_letters", gg)["fp"].to_pylist())
    if frontier.num_rows == 0:
        return frontier
    mask = [fp not in done for fp in frontier["fp"].to_pylist()]
    return frontier.filter(pa.array(mask))


def find_lost_attachments(out: str, g: int) -> pa.Table:
    """Image-callback frontier rows of generation g that WERE crawled
    (crawl_order has their fp) but whose sink row is gone from the images
    table — the reference's attachment-repair case (DownLoad.make_job
    re-offers files whose status != success, download.py + SP_JOBS). A
    plain ``find_residual`` misses these because the fp looks done."""
    frontier = _frontier_table(out, g)
    if frontier.num_rows == 0:
        return frontier
    import pyarrow.compute as pc

    imgs = frontier.filter(pc.equal(frontier["callback"], "image"))
    if imgs.num_rows == 0:
        return imgs
    done = set(_read_gen_table(out, "crawl_order", g)["fp"].to_pylist())
    have = set(_read_gen_table(out, "images", g)["image_id"].to_pylist())
    mask = [fp in done and fp not in have for fp in imgs["fp"].to_pylist()]
    return imgs.filter(pa.array(mask))


def run_patch(engine: CrawlEngine) -> dict:
    """Repair an (interrupted or damaged) run in place. Returns per-gen
    stats: {gen: residual_rows_processed}."""
    import shutil

    out = engine.out
    stats: dict[int, int] = {}
    done_prior: set = set()
    g = 0
    while g < engine.policy.max_generations and os.path.isdir(_gen_dir(out, "frontier", g)):
        CrawlEngine._maybe_rerank(_gen_dir(out, "frontier", g))  # same rule as run()
        if find_lost_attachments(out, g).num_rows:
            # sink rows lost though the fetch log says done: re-crawling
            # only the lost rows would duplicate crawl_order parts (part
            # keys depend on batch grouping), so drop this generation's
            # sinks and let the normal residual path re-crawl it whole —
            # deterministic fetches + content-keyed parts make the redo
            # idempotent.
            for t in ("pages", "details", "images", "dead_letters",
                      "crawl_order", "hostmeta"):
                d = os.path.join(out, "tables", t, f"gen={g}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
        residual = find_residual(out, g, done_prior)
        if residual.num_rows:
            if engine.policy.dedup_mode == "cuckoo":
                # cuckoo supports DELETION: restore the latest seen snapshot
                # and surgically un-see the residual fps, then re-offer
                # through the SAME pool — no fresh-pool workaround (the
                # reference instead drops the whole Redis dupefilter,
                # SP_JOBS/job.py:76-77). Residuals never offered before
                # delete as a no-op and are accepted on offer either way.
                pool = ShardedSeenSet(
                    num_shards=engine.policy.num_shards, mode="cuckoo",
                    bloom_mem_mb=engine.policy.bloom_mem_mb,
                )
                snap = None
                for gg in range(g, -1, -1):
                    cand = os.path.join(out, "seen", f"gen-{gg}")
                    if os.path.isdir(cand):
                        snap = cand
                        break
                if snap:
                    pool.restore(snap)
                    pool.delete(residual["fp"].to_pylist())
            else:
                # fresh pool per patched generation = the reference's cleared
                # dupefilter; intra-residual first-wins still applies (fused)
                pool = ShardedSeenSet(
                    num_shards=engine.policy.num_shards, mode="exact"
                )
            fetcher = FetchGroup(
                engine.params, engine.policy, engine.pol_cfg, seen_pool=pool
            )

            def fetch_group(df, fetcher=fetcher):
                return fetcher(df)

            def add_fetch_key(t: pa.Table) -> pa.Table:
                return t.append_column("fetch_key", t["host"])

            children = (
                rd.from_arrow(residual)
                .map_batches(add_fetch_key, batch_format="pyarrow")
                .groupby("fetch_key")
                .map_groups(fetch_group, batch_format="pandas")
                .map_batches(
                    make_parse_sink(out, engine.parsers, engine.policy.dirty_words,
                                    engine.policy.splash),
                    batch_format="pyarrow",
                )
                .to_arrow_refs()
            )
            import ray

            child_tables = [t for t in ray.get(children) if t.num_rows]
            if child_tables:
                tbl = pa.concat_tables(child_tables).cast(schemas.FRONTIER)
                write_part(
                    tbl.to_pylist(), schemas.FRONTIER,
                    _gen_dir(out, "frontier", g + 1), g + 1,
                )
            stats[g] = residual.num_rows
            pool.shutdown()
        done_prior |= set(_read_gen_table(out, "crawl_order", g)["fp"].to_pylist())
        done_prior |= set(_read_gen_table(out, "dead_letters", g)["fp"].to_pylist())
        g += 1
    return stats
