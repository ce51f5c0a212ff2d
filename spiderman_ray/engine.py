"""The BFS generation-loop engine: frontier -> dedup -> fetch -> parse/sink.

Replaces the reference's shared Redis FIFO + N scrapy processes
(SP_JOBS/job.py:96-133) with a driver loop over per-generation frontier
Datasets (SURVEY.md §7.2.4):

    frontier_0 = seeds                        (gen 0, seq = push order)
    while frontier_g nonempty:
        sched   = dedup(frontier_g)           # first-wins groupby + seen actors
        fetched = sched.groupby(fetch_key).map_groups(FetchGroup)   # politeness
        frontier_{g+1} = fetched.map_batches(ParseSink)             # rows sunk
        checkpoint(g)                         # frontier, seen shards, manifest

Each generation runs as ONE streaming Ray Data pipeline with a single
consumer (writing the next frontier); page/detail/image rows leave the
pipeline inside ParseSink, so image bytes are never dataset-materialized.
The BFS barrier per generation is what makes the crawl order equal the
reference's single-process FIFO (README.md:103; SURVEY.md §7.3) — the
reference gets it implicitly from its Redis list, we get it explicitly.

Checkpoint/resume (the patch-job model, SP_JOBS/zhifang_job_patch.py, made
first-class): everything under ``out_dir`` is the checkpoint —

    frontier/gen={g}/      the materialized frontier (parquet/lance parts)
    tables/{t}/gen={g}/    output rows for generation g
    seen/gen-{g}/          per-shard seen-set snapshots AFTER gen g
    manifests/gen-{g}.json lineage: counts, parent manifest hash, complete

``resume=True`` finds the last complete manifest, restores the seen shards,
deletes any partial later generations, and continues — bit-identical final
tables (tested by killing mid-crawl in tests/test_engine.py).

Skew: pass ``salt_max_group`` to split hosts with more frontier rows than
the cap into ``host#i`` sub-groups; per-host politeness stays exact through
the shared HostClock actor (slot ranges reserved atomically). Salting trades
the deterministic per-host crawl order INSIDE a generation for parallelism —
conformance mode leaves it off, throughput mode sets it.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from spiderman_ray import schemas
from spiderman_ray.functions.hashing import hash64, md5_hex
from spiderman_ray.oracle import seed_requests
from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams, SimWeb
from spiderman_ray.sources.table_io import read_dataset, write_dataset
from spiderman_ray.stages.fetch import FetchGroup
from spiderman_ray.stages.parse_sink import CRAWL_ORDER, HOSTMETA, make_parse_sink
from spiderman_ray.state.politeness import HostClock
from spiderman_ray.state.seen import ShardedSeenSet

TABLES = ("pages", "details", "images", "dead_letters", "crawl_order", "hostmeta")


@ray.remote
def _pipelined_wave(
    rows: pa.Table,
    fetch_key: str,
    params,
    policy,
    pol_cfg: dict,
    host_clock,
    seen_pool,
    frontier_shards: list,
    out_dir: str,
    parsers,
    dirty_words,
    splash,
) -> tuple[list, float]:
    """One pipelined fetch+parse wave: a single-(host, generation) slice of
    the frontier (``rows`` arrives as the pop_wave return REFERENCE — the
    driver never materializes it). Fetch, dedup (fused, via the shared
    seen actors), parse, sink AND the child push into the frontier shards
    all happen inside the task; only [(host, gen, n_rows), ...] summaries
    and the wall-clock politeness hint return to the driver scheduler.
    Child pushes carry this wave's token, so a Ray task retry re-pushes
    idempotently."""
    from spiderman_ray.state.frontier import shard_of

    rows = rows.append_column(
        "fetch_key", pa.array([fetch_key] * rows.num_rows, pa.string())
    )
    fetcher = FetchGroup(
        params, policy, pol_cfg, base_slots={}, host_clock=host_clock,
        seen_pool=seen_pool,
    )
    wire = fetcher(rows.to_pandas())
    sink = make_parse_sink(out_dir, parsers, dirty_words, splash)
    children = sink(wire)
    # BFS parity: generations at/beyond the cap are never fetched
    children = children.filter(
        pc.less(children["generation"], policy.max_generations)
    )
    summaries: list = []
    if children.num_rows:
        k = len(frontier_shards)
        by_shard: dict[int, list] = {}
        for h in pc.unique(children["host"]).to_pylist():
            by_shard.setdefault(shard_of(h, k), []).append(h)
        refs = [
            frontier_shards[s].push.remote(
                f"{fetch_key}|s{s}",
                children.filter(
                    pc.is_in(children["host"], value_set=pa.array(mine))
                ),
            )
            for s, mine in by_shard.items()
        ]
        for acc in ray.get(refs):
            summaries.extend(acc)
    next_ok = 0.0
    if policy.clock == "wall":
        host = str(rows["host"][0].as_py())
        cfg = pol_cfg.get(host)
        delay = int(cfg["crawl_delay_ms"]) if cfg else policy.default_delay_ms
        if delay > 0:
            next_ok = time.time() * 1000.0 + delay
    return summaries, next_ok


def _gen_dir(out: str, kind: str, g: int) -> str:
    return os.path.join(out, kind, f"gen={g}")


def _count_parquet_rows(dir_path: str) -> int:
    if not os.path.isdir(dir_path):
        return 0
    total = 0
    for f in os.listdir(dir_path):
        if f.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(dir_path, f)).metadata.num_rows
    return total


def _host_counts(frontier_dir: str, n_rows: int | None = None) -> dict:
    """Host histogram of a frontier checkpoint. Hosts are bounded (the
    politeness config enumerates them), rows are not: below the cap the
    driver scans just the host column; above it, per-block value_counts
    run as Ray tasks and only the tiny per-block histograms return."""
    import collections

    ctr: collections.Counter = collections.Counter()
    cap = int(os.environ.get("SPIDERMAN_HISTOGRAM_DRIVER_CAP", "2000000"))
    if n_rows is not None and n_rows > cap and ray.is_initialized():
        def vc_batch(t: pa.Table) -> pa.Table:
            vc = t["host"].combine_chunks().value_counts()
            return pa.table({"host": vc.field("values"), "n": vc.field("counts")})

        parts = rd.read_parquet(frontier_dir, columns=["host"]).map_batches(
            vc_batch, batch_format="pyarrow"
        )
        for b in parts.iter_batches(batch_format="pyarrow"):
            for v, c in zip(b["host"].to_pylist(), b["n"].to_pylist()):
                ctr[v] += c
        return {"host": list(ctr.keys()), "count()": list(ctr.values())}
    for f in os.listdir(frontier_dir):
        if f.endswith(".parquet"):
            col = pq.read_table(os.path.join(frontier_dir, f), columns=["host"])["host"]
            vc = col.combine_chunks().value_counts()
            for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                ctr[v] += c
    return {"host": list(ctr.keys()), "count()": list(ctr.values())}


def _read_gen_table(out: str, table: str, g: int) -> pa.Table:
    d = _gen_dir(os.path.join(out, "tables"), table, g)
    parts = sorted(os.listdir(d)) if os.path.isdir(d) else []
    tabs = [pq.read_table(os.path.join(d, f)) for f in parts if f.endswith(".parquet")]
    if not tabs:
        schema = {
            "pages": schemas.PAGES,
            "details": schemas.DETAILS,
            "images": schemas.IMAGES_FULL,
            "dead_letters": schemas.DEAD_LETTERS,
            "crawl_order": CRAWL_ORDER,
            "hostmeta": HOSTMETA,
        }[table]
        return schemas.empty(schema)
    return pa.concat_tables(tabs)


def read_table_all_gens(out: str, table: str) -> pa.Table:
    base = os.path.join(out, "tables", table)
    gens = sorted(
        int(d.split("=")[1]) for d in os.listdir(base) if d.startswith("gen=")
    ) if os.path.isdir(base) else []
    tabs = [_read_gen_table(out, table, g) for g in gens]
    return pa.concat_tables(tabs) if tabs else _read_gen_table(out, table, -1)


class CrawlEngine:
    def __init__(
        self,
        params: SimParams,
        policy: CrawlPolicy | None = None,
        out_dir: str = "/tmp/spiderman_run",
        delays_ms: dict[str, int] | None = None,
        parse_batch_size: int = 256,
        salt_max_group: int | None = None,
        auto_salt_cap: int = 64,
        parsers: dict | None = None,
        seed_fn=None,
    ):
        self.parsers = parsers  # None -> parsers.PARSERS (spec.CrawlSpec surface)
        self.seed_fn = seed_fn or seed_requests
        self.params = params
        self.policy = policy or CrawlPolicy()
        self.out = out_dir
        self.web = SimWeb(params)
        self.pol_cfg = self.web.politeness_config(delays_ms)
        self.parse_batch_size = parse_batch_size
        self.salt_max_group = salt_max_group
        self.auto_salt_cap = auto_salt_cap

    # -- checkpoint helpers ------------------------------------------------
    def _write_policy(self) -> None:
        """Persist the CrawlPolicy next to the checkpoint so patch/resume
        runs launched later (e.g. the CLI) recover the SAME behavioral
        config (splash routing, dirty words, dedup mode) instead of
        defaults — config lives with the data it produced."""
        from dataclasses import asdict

        d = asdict(self.policy)
        with open(os.path.join(self.out, "policy.json"), "w") as f:
            json.dump(d, f)

    def _manifest_path(self, g: int) -> str:
        return os.path.join(self.out, "manifests", f"gen-{g}.json")

    def last_complete_generation(self) -> int:
        mdir = os.path.join(self.out, "manifests")
        if not os.path.isdir(mdir):
            return -1
        last = -1
        for g in range(0, 10_000):
            p = self._manifest_path(g)
            if not os.path.exists(p):
                break
            with open(p) as f:
                if json.load(f).get("complete"):
                    last = g
                else:
                    break
        return last

    @staticmethod
    def _gen_of(dirname: str) -> int | None:
        """'gen=3' -> 3; interrupted writes leave 'gen=3.tmp-xxxx' dirs which
        are partial by definition -> report their generation so cleanup
        removes them instead of crashing on int()."""
        if not dirname.startswith("gen="):
            return None
        tail = dirname[4:]
        num = tail.split(".tmp-")[0]
        try:
            g = int(num)
        except ValueError:
            return None
        return g if ".tmp-" not in tail else -(10**9)  # tmp: always delete

    def _cleanup_after(self, g_last: int) -> None:
        """Delete partial state from generations after ``g_last`` (and any
        interrupted .tmp- write dirs)."""
        for t in TABLES:
            base = os.path.join(self.out, "tables", t)
            if os.path.isdir(base):
                for d in os.listdir(base):
                    g = self._gen_of(d)
                    if g is not None and (g > g_last or g < 0):
                        shutil.rmtree(os.path.join(base, d))
        fbase = os.path.join(self.out, "frontier")
        if os.path.isdir(fbase):
            for d in os.listdir(fbase):
                g = self._gen_of(d)
                if g is not None and (g > g_last + 1 or g < 0):
                    shutil.rmtree(os.path.join(fbase, d))
        for path in (os.path.join(self.out, "seen"), os.path.join(self.out, "manifests")):
            if os.path.isdir(path):
                for d in os.listdir(path):
                    try:
                        num = int(d.replace("gen-", "").split(".")[0])
                    except ValueError:
                        continue
                    if num > g_last:
                        target = os.path.join(path, d)
                        shutil.rmtree(target) if os.path.isdir(target) else os.remove(target)

    def _base_slots_through(self, g_last: int) -> dict[str, int]:
        slots: dict[str, int] = {}
        for g in range(0, g_last + 1):
            hm = _read_gen_table(self.out, "hostmeta", g)
            for host, n in zip(hm["host"].to_pylist(), hm["n_meta"].to_pylist()):
                slots[host] = slots.get(host, 0) + int(n)
        return slots

    @staticmethod
    def _maybe_rerank(fdir: str) -> None:
        """Dense re-rank of a frontier checkpoint (seq -> 0..n-1 in seq
        order) when the child_seq encoding would overflow — the same
        deterministic rule the oracle applies per wave (parsers.py
        RERANK_THRESHOLD). Order-preserving, so conformance is unaffected.
        Driver-side at test scale; the 10^10 path is a sort + per-block
        offset cumsum (distributed dense rank).

        Crash-safe: reranked parts are written to a sibling tmp dir, the
        original dir is moved aside (.rr-old), the tmp swapped in, then the
        old removed — each step atomic, with recovery for every window.

        ``run()`` calls this BEFORE counting frontier rows: a crash between
        os.rename(fdir, old) and os.rename(tmp, fdir) leaves the frontier
        absent, and counting first would read 0 rows and end the crawl with
        a generation still pending (silent truncation)."""
        from spiderman_ray.parsers import RERANK_THRESHOLD

        old = fdir + ".rr-old"
        if os.path.isdir(old):
            if os.path.isdir(fdir):
                shutil.rmtree(old)  # crashed after swap-in: finish cleanup
            else:
                os.rename(old, fdir)  # crashed between moves: roll back
        if not os.path.isdir(fdir):
            return  # no frontier at all (crawl finished) — nothing to rerank
        files = [f for f in os.listdir(fdir) if f.endswith(".parquet")]
        max_seq, stats_found = 0, False
        for f in files:
            md = pq.ParquetFile(os.path.join(fdir, f)).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "seq" and col.statistics is not None:
                        stats_found = True
                        max_seq = max(max_seq, col.statistics.max or 0)
        if not stats_found:  # stats absent: fall back to reading the column
            for f in files:
                seqs = pq.read_table(os.path.join(fdir, f), columns=["seq"])["seq"]
                if len(seqs):
                    max_seq = max(max_seq, pa.compute.max(seqs).as_py())
        if max_seq < RERANK_THRESHOLD:
            return
        n_rows = sum(
            pq.ParquetFile(os.path.join(fdir, f)).metadata.num_rows for f in files
        )
        tmp = fdir + ".rr-tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        driver_cap = int(os.environ.get("SPIDERMAN_RERANK_DRIVER_CAP", "200000"))
        if n_rows <= driver_cap or not ray.is_initialized():
            # small frontier: concat-sort on the driver (cheaper than a
            # distributed sort below ~10^5 rows)
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(fdir, f)) for f in files]
            ).sort_by("seq")
            tbl = tbl.set_column(
                tbl.schema.get_field_index("seq"), "seq",
                pa.array(np.arange(tbl.num_rows, dtype=np.int64)),
            )
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            n_parts = max(1, min(tbl.num_rows // 1000 + 1, 4 * ncpu))
            rows_per = -(-tbl.num_rows // n_parts)
            os.makedirs(tmp)
            for i in range(n_parts):
                part = tbl.slice(i * rows_per, rows_per)
                if part.num_rows:
                    pq.write_table(part, os.path.join(tmp, f"part-rr-{i:05d}.parquet"))
        else:
            CrawlEngine._rerank_distributed(fdir, tmp)
        os.rename(fdir, old)
        os.rename(tmp, fdir)
        shutil.rmtree(old)

    @staticmethod
    def _rerank_distributed(fdir: str, tmp: str) -> None:
        """Distributed dense re-rank (the 10^10 path): sort by seq (range
        partitioning gives blocks with disjoint, ordered seq ranges), take
        ONE tiny (min_seq, count) summary row per block, cumsum the counts
        on the driver (O(blocks), not O(rows)), then assign each block
        seq = its offset + arange — the whole frontier never touches
        driver memory. Output equals the driver path bit-for-bit (seqs are
        unique, so dense rank is deterministic)."""
        import ray.data as rd

        sorted_ds = rd.read_parquet(fdir).sort("seq").materialize()

        def summarize(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"min_seq": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {
                    "min_seq": pa.array([t["seq"][0].as_py()], type=pa.int64()),
                    "n": pa.array([t.num_rows], type=pa.int64()),
                }
            )

        summary = (
            sorted_ds.map_batches(summarize, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .sort_values("min_seq")
        )
        offsets = dict(
            zip(summary["min_seq"], np.cumsum(summary["n"]) - summary["n"])
        )

        def assign(t: pa.Table, offsets=offsets) -> pa.Table:
            if t.num_rows == 0:
                return t
            off = int(offsets[t["seq"][0].as_py()])
            return t.set_column(
                t.schema.get_field_index("seq"), "seq",
                pa.array(off + np.arange(t.num_rows, dtype=np.int64)),
            )

        write_dataset(
            sorted_ds.map_batches(assign, batch_format="pyarrow", batch_size=None), tmp
        )

    # -- the run -----------------------------------------------------------
    def run(self, resume: bool = False) -> dict:
        t0 = time.time()
        policy = self.policy
        if policy.autothrottle and policy.clock != "virtual":
            raise ValueError("autothrottle requires the virtual politeness clock")
        throttle_clock = None
        if policy.autothrottle:
            from spiderman_ray.state.politeness import ThrottleClock

            # crawl-lifetime adaptive-delay ledger; resume restarts delays
            # at start_delay (the scrapy-restart behavior, documented)
            throttle_clock = ThrottleClock.remote()
        if resume:
            g_last = self.last_complete_generation()
            self._cleanup_after(g_last)
            start_gen = g_last + 1
        else:
            if os.path.isdir(self.out):
                shutil.rmtree(self.out)
            start_gen = 0
        os.makedirs(os.path.join(self.out, "manifests"), exist_ok=True)
        self._write_policy()

        pool = ShardedSeenSet(
            num_shards=policy.num_shards,
            mode=policy.dedup_mode,
            bloom_mem_mb=policy.bloom_mem_mb,
            bloom_k=policy.bloom_k,
        )
        base_slots: dict[str, int] = {}
        host_clock = None
        if resume and start_gen > 0:
            pool.restore(os.path.join(self.out, "seen", f"gen-{start_gen - 1}"))
            base_slots = self._base_slots_through(start_gen - 1)

        if start_gen == 0:
            seeds = pa.Table.from_pylist(
                self.seed_fn(self.web), schema=schemas.FRONTIER
            )
            write_dataset(
                rd.from_arrow(seeds), _gen_dir(self.out, "frontier", 0)
            )

        g = start_gen
        while g < policy.max_generations:
            tg0 = time.time()
            phase: dict[str, float] = {}

            def mark(name: str, _p=phase, _t=[time.time()]) -> None:
                now = time.time()
                _p[name] = round(now - _t[0], 3)
                _t[0] = now

            fdir = _gen_dir(self.out, "frontier", g)
            # rerank (and its .rr-old crash recovery) runs BEFORE the row
            # count — see _maybe_rerank's crash-window note
            self._maybe_rerank(fdir)
            n_frontier = _count_parquet_rows(fdir)
            if n_frontier == 0:
                break
            # block sizing: ~1k frontier rows per block, capped at 4x CPUs.
            # The post-shuffle map_groups runs ONE TASK PER BLOCK (groups are
            # packed into blocks), so block count IS the fetch parallelism —
            # too few blocks leaves CPUs idle behind stragglers; tiny
            # generations must still not pay a wide sort.
            # ~500 rows/block, capped at 8 tasks/CPU: finer blocks shrink the
            # sort-boundary-sampling straggler (round-2 measured: max task 2x
            # mean at 1000-row blocks; 500/8x cut gen-2 wall ~15%)
            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            div = int(os.environ.get("SPIDERMAN_NBLOCKS_DIV", "500"))
            capx = int(os.environ.get("SPIDERMAN_NBLOCKS_CAP_X", "8"))
            nblocks = max(1, min(n_frontier // div + 1, capx * ncpu))
            frontier = read_dataset(fdir, override_num_blocks=nblocks)
            # dedup is fused into the fetch stage (one shuffle serves dedup
            # AND politeness: fp determines host) — see stages/fetch.py
            sched = frontier

            # fetch partitioning key: host, salted for oversized hosts.
            # Salting never changes recorded (generation, seq) order — only
            # which worker fetches — so zero-delay hosts are ALWAYS safe to
            # salt (their virtual timestamps are 0 regardless of slot).
            # Hosts with a crawl-delay budget are salted only on request
            # (throughput mode) and then draw slot ranges from HostClock.
            salt_map: dict[str, int] = {}
            need_clock = False
            # host histogram off the frontier checkpoint — driver scan of
            # the one column below a cap, distributed per-block
            # value_counts above it (see _host_counts)
            mark("count")
            # autothrottle disables salting outright: every host carries an
            # ADAPTIVE delay budget, so splitting one would need slot-range
            # semantics the adaptive ledger can't define
            counts = (
                {"host": [], "count()": []}
                if policy.autothrottle
                else _host_counts(fdir, n_rows=n_frontier)
            )
            mark("salt_histogram")
            for h, c in zip(counts["host"], counts["count()"]):
                cfg = self.pol_cfg.get(h)
                delay = int(cfg["crawl_delay_ms"]) if cfg else self.policy.default_delay_ms
                if delay == 0 and c > self.auto_salt_cap:
                    salt_map[h] = int(np.ceil(c / self.auto_salt_cap))
                elif self.salt_max_group and c > self.salt_max_group:
                    if delay > 0 and policy.clock == "wall":
                        # refuse: wall_next is local to each fetch group, so
                        # S salted sub-groups would fetch S× per delay window
                        # (HostClock coordinates virtual slots only). The
                        # host stays one group; its delay bounds throughput
                        # anyway, so splitting it buys nothing.
                        continue
                    salt_map[h] = int(np.ceil(c / self.salt_max_group))
                    need_clock = need_clock or delay > 0
            if need_clock and host_clock is None:
                host_clock = HostClock.remote()
                ray.get(host_clock.init.remote(base_slots))

            def add_fetch_key(t: pa.Table, salt_map=salt_map) -> pa.Table:
                hosts = t["host"].to_pylist()
                if salt_map:
                    # salt by the FINGERPRINT, not the raw url: dedup
                    # identity is fp = md5(canonicalize(url)+body), so two
                    # spellings of one fp must land in the same sub-group
                    # for first-wins to follow seq, not execution order
                    salts = hash64(t["fp"].to_pylist())
                    keys = [
                        f"{h}#{int(s) % salt_map[h]}" if h in salt_map else h
                        for h, s in zip(hosts, salts)
                    ]
                else:
                    keys = hosts
                return t.append_column("fetch_key", pa.array(keys, type=pa.string()))

            keyed = sched.map_batches(add_fetch_key, batch_format="pyarrow")

            fetcher = FetchGroup(
                self.params,
                policy,
                self.pol_cfg,
                base_slots=base_slots,
                host_clock=host_clock,  # set only when a delayed host is salted
                seen_pool=pool,
                throttle_clock=throttle_clock,
            )
            def fetch_group(df, fetcher=fetcher):
                return fetcher(df)

            fetched = keyed.groupby("fetch_key").map_groups(
                fetch_group, batch_format="pandas"
            )

            # parse/sink runs FUSED with the fetch tasks (plain function):
            # bytes-heavy blocks never re-cross the object store. Measured
            # alternatives: per-generation actor pools pay startup + copy
            # costs that dwarf the straggler overlap they buy.
            next_frontier = fetched.map_batches(
                make_parse_sink(self.out, self.parsers, policy.dirty_words,
                                policy.splash),
                batch_format="pyarrow",
                batch_size=self.parse_batch_size,
                num_cpus=1,
            )
            mark("plan")
            # the single consumer: materializing the next frontier checkpoint
            write_dataset(next_frontier, _gen_dir(self.out, "frontier", g + 1))
            mark("pipeline")
            if os.environ.get("SPIDERMAN_STATS"):
                print(f"--- generation {g} stats ---\n{next_frontier.stats()}")

            # account politeness slots for cross-generation continuity
            hm = _read_gen_table(self.out, "hostmeta", g)
            for host, n in zip(hm["host"].to_pylist(), hm["n_meta"].to_pylist()):
                base_slots[host] = base_slots.get(host, 0) + int(n)

            mark("hostmeta")
            pool.clear_tokens()  # retry-idempotency tokens live one generation
            if host_clock is not None:
                ray.get(host_clock.clear_tokens.remote())
            if throttle_clock is not None:
                ray.get(throttle_clock.clear_tokens.remote())
            snap_dir = os.path.join(self.out, "seen", f"gen-{g}")
            pool.snapshot(snap_dir)
            mark("snapshot")

            counts = {t: _count_parquet_rows(
                _gen_dir(os.path.join(self.out, "tables"), t, g)
            ) for t in TABLES}
            parent = self._manifest_path(g - 1)
            manifest = {
                "generation": g,
                "frontier_in": n_frontier,
                "frontier_next": _count_parquet_rows(_gen_dir(self.out, "frontier", g + 1)),
                "counts": counts,
                "seen_snapshot": snap_dir,
                "seen_count": pool.count(),
                "parent_hash": md5_hex(open(parent).read()) if os.path.exists(parent) else "",
                "salted_hosts": salt_map,
                "wall_s": round(time.time() - t0, 3),
                "gen_wall_s": round(time.time() - tg0, 3),
                "phase_s": phase,
                "complete": True,
            }
            tmp = self._manifest_path(g) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, self._manifest_path(g))
            g += 1

        totals = {t: 0 for t in TABLES}
        for gg in range(0, g):
            for t in TABLES:
                totals[t] += _count_parquet_rows(
                    _gen_dir(os.path.join(self.out, "tables"), t, gg)
                )
        metrics = {
            "generations": g,
            "crawled": totals["crawl_order"],
            "pages": totals["pages"],
            "details": totals["details"],
            "images": totals["images"],
            "dead": totals["dead_letters"],
            "seen_count": pool.count(),
            "wall_s": round(time.time() - t0, 3),
        }
        self._pool = pool  # kept for tests (seen-set comparisons); callers may shutdown
        return metrics

    # -- pipelined (non-BFS) throughput mode --------------------------------
    def run_pipelined(self, max_pending: int | None = None) -> dict:
        """Opt-in throughput mode: the reference's shared-FIFO semantics
        (SP_JOBS/job.py:96-133 — N scrapy processes popping one Redis list,
        children pushed mid-crawl, SP/spiders/zhifang.py:96) instead of the
        BFS generation barrier. A driver scheduler keeps one request buffer
        per host and launches fetch+parse WAVES (raw Ray tasks — the dynamic
        feedback loop is the one crawl shape ray.data can't express) the
        moment a host is free, so generation g+1 fetches start while g is
        still being fetched elsewhere.

        Semantics contract (documented, tested in tests/test_engine.py):
        - seen set, politeness budgets, robots, retries, fetch outcomes and
          sink CONTENT are identical to BFS mode;
        - winner ATTRIBUTION on duplicate-linked URLs (which parent's
          lineage a deduped fetch carries) is pop-order-defined, exactly
          like the reference's racy multi-process FIFO. On a crawl graph
          with no cross-parent duplicate links, ALL tables except
          crawl_order/hostmeta (mode-defined by construction: vts slots and
          group boundaries differ) are bit-identical to BFS mode.
        - checkpoint/resume, patch and the per-generation rerank are BFS-
          mode features: a deep crawl that would overflow the seq encoding
          raises OverflowError here (use BFS mode, which re-ranks).

        Scale: NOTHING row-sized touches the driver. The frontier lives in
        a host-hashed FrontierShard actor pool (the Ray-native analog of
        the reference's external Redis list): waves push children straight
        into the shards (token-idempotent) and the driver hands each new
        wave its rows as the pop_wave return REFERENCE. The driver holds
        O(hosts x active generations) integer counters plus one ref per
        in-flight wave.
        """
        import collections

        from spiderman_ray.state.frontier import FrontierShard, shard_of

        t0 = time.time()
        policy = self.policy
        if policy.autothrottle:
            raise ValueError(
                "autothrottle is a BFS-mode feature (its per-host ledger "
                "relies on the generation barrier serializing fetch groups)"
            )
        if os.path.isdir(self.out):
            shutil.rmtree(self.out)
        os.makedirs(self.out, exist_ok=True)
        self._write_policy()

        pool = ShardedSeenSet(
            num_shards=policy.num_shards,
            mode=policy.dedup_mode,
            bloom_mem_mb=policy.bloom_mem_mb,
            bloom_k=policy.bloom_k,
        )
        host_clock = HostClock.remote()
        ray.get(host_clock.init.remote({}))
        n_fshards = max(1, policy.num_shards // 2)
        fshards = [FrontierShard.remote() for _ in range(n_fshards)]

        # broadcast the per-wave constants ONCE (ray.put), not per task
        consts = [
            ray.put(x)
            for x in (self.params, policy, self.pol_cfg, self.out,
                      self.parsers, policy.dirty_words, policy.splash)
        ]
        (params_r, policy_r, cfg_r, out_r, parsers_r, dirty_r, splash_r) = consts

        def delay_of(host: str) -> int:
            cfg = self.pol_cfg.get(host)
            return int(cfg["crawl_delay_ms"]) if cfg else policy.default_delay_ms

        # driver-side bookkeeping: INTEGER counters only
        counts: dict[tuple[str, int], int] = collections.defaultdict(int)
        max_gen = 0

        def absorb(summaries: list) -> None:
            nonlocal max_gen
            for h, g, n in summaries:
                counts[(h, g)] += n
                max_gen = max(max_gen, g)

        seeds = pa.Table.from_pylist(self.seed_fn(self.web), schema=schemas.FRONTIER)
        seeds = seeds.filter(pc.less(seeds["generation"], policy.max_generations))
        seed_pushes = []
        for h in pc.unique(seeds["host"]).to_pylist():
            part = seeds.filter(pc.equal(seeds["host"], h))
            seed_pushes.append(
                fshards[shard_of(h, n_fshards)].push.remote(f"seeds|{h}", part)
            )
        for acc in ray.get(seed_pushes):
            absorb(acc)

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        cap = max_pending or 8 * ncpu
        pending: dict = {}  # ObjectRef -> host
        busy: dict[str, int] = collections.defaultdict(int)
        next_ok: dict[str, float] = {}
        wave_no = 0
        waves_since_clear = 0

        def launch_ready() -> int:
            nonlocal wave_no, waves_since_clear
            launched = 0
            now_ms = time.time() * 1000.0
            # one pop candidate per host: its lowest pending generation
            # (cross-gen first-wins follows discovery order per host)
            host_gen: dict[str, int] = {}
            for (h, g), n in counts.items():
                if n > 0 and (h not in host_gen or g < host_gen[h]):
                    host_gen[h] = g
            for h in sorted(host_gen):
                if len(pending) >= cap:
                    break
                # zero-delay hosts launch freely (politeness-trivial; dedup
                # races across in-flight waves are the documented reference-
                # FIFO semantics, and can't occur without duplicate links);
                # delay-budgeted hosts stay strictly one wave at a time
                delayed = delay_of(h) > 0
                if delayed and (busy[h] or now_ms < next_ok.get(h, 0.0)):
                    continue
                g = host_gen[h]
                while counts[(h, g)] > 0 and len(pending) < cap:
                    pop_cap = None if delayed else self.auto_salt_cap
                    tbl_ref, meta_ref = fshards[
                        shard_of(h, n_fshards)
                    ].pop_wave.options(num_returns=2).remote(h, g, pop_cap)
                    meta = ray.get(meta_ref)
                    # snapshot-correct: a wave's push may have landed at the
                    # shard before its summary reached the driver
                    counts[(h, g)] = meta["left"]
                    if meta["n"] == 0:
                        break
                    wave_no += 1
                    ref = _pipelined_wave.remote(
                        tbl_ref, f"{h}|w{wave_no}",
                        params_r, policy_r, cfg_r, host_clock,
                        pool, fshards, out_r, parsers_r, dirty_r, splash_r,
                    )
                    pending[ref] = h
                    busy[h] += 1
                    launched += 1
                    if delayed:
                        break  # one wave at a time for a budgeted host
            return launched

        def have_rows() -> bool:
            return any(n > 0 for n in counts.values())

        while have_rows() or pending:
            launch_ready()
            if pending:
                # drain completions in batches: a one-ref wait per loop turn
                # makes the driver the bottleneck at ~1000 waves/generation
                done, _ = ray.wait(
                    list(pending), num_returns=min(len(pending), 16), timeout=0.05
                )
                for ref in done:
                    h = pending.pop(ref)
                    busy[h] -= 1
                    summaries, nok = ray.get(ref)
                    if nok:
                        next_ok[h] = nok
                    absorb(summaries)
                    waves_since_clear += 1
                if not pending and waves_since_clear >= 128:
                    # safe point (no wave can replay an offer mid-clear):
                    # drop idempotency tokens so they stay bounded
                    pool.clear_tokens()
                    ray.get(host_clock.clear_tokens.remote())
                    ray.get([s.clear_tokens.remote() for s in fshards])
                    waves_since_clear = 0
            elif have_rows():
                # every rowful host is wall-clock gated: sleep to the
                # earliest next_ok
                gated = [
                    next_ok.get(h, 0.0)
                    for (h, g), n in counts.items() if n > 0
                ]
                wait_s = max(0.0, (min(gated) - time.time() * 1000.0) / 1000.0)
                time.sleep(min(wait_s, 0.05) or 0.001)

        pool.snapshot(os.path.join(self.out, "seen", "final"))
        totals = {t: 0 for t in TABLES}
        for t in TABLES:
            base = os.path.join(self.out, "tables", t)
            if os.path.isdir(base):
                for d in os.listdir(base):
                    totals[t] += _count_parquet_rows(os.path.join(base, d))
        metrics = {
            "mode": "pipelined",
            "generations": max_gen + 1,
            "waves": wave_no,
            "crawled": totals["crawl_order"],
            "pages": totals["pages"],
            "details": totals["details"],
            "images": totals["images"],
            "dead": totals["dead_letters"],
            "seen_count": pool.count(),
            "wall_s": round(time.time() - t0, 3),
        }
        self._pool = pool
        return metrics
