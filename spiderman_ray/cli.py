"""CLI — the ``ray job submit`` entry point for the crawl engine.

    python -m spiderman_ray.cli crawl --scale t2 --out /tmp/run [--resume]
        [--bloom] [--no-dedup] [--salt-max-group N] [--max-generations N]
    python -m spiderman_ray.cli validate --images /tmp/run/tables/images
    python -m spiderman_ray.cli oracle --scale t1

Replaces the reference's job launchers (``python SP_JOBS/zhifang_job.py -p P
-n N``, SP_JOBS/job.py:96-133) and ``execute_download.py``. This module OWNS
a Ray session (guarded init); library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from spiderman_ray.pipelines import configure_shuffle

    configure_shuffle()  # SPIDERMAN_SHUFFLE knob; sort-shuffle default
    return ray


def cmd_crawl(args: argparse.Namespace) -> int:
    ray = _ray_session()
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.simweb import SimParams

    splash = None
    if args.splash_callbacks:
        splash = {
            "callbacks": tuple(args.splash_callbacks.split(",")),
            "wait": 2,
            "images": args.splash_images,
        }
    policy = CrawlPolicy(
        dedup=not args.no_dedup,
        dedup_mode="bloom" if args.bloom else args.dedup_mode,
        max_generations=args.max_generations,
        splash=splash,
    )
    if args.resume:
        # resume must continue under the ORIGINAL behavioral config or the
        # engine ≡ oracle bit-identity breaks mid-crawl; the stored policy
        # wins (only max_generations, a budget not a behavior, carries over
        # from the flags)
        from spiderman_ray.policy import load_policy

        stored = load_policy(args.out)
        if stored is not None:
            stored.max_generations = args.max_generations
            policy = stored
    eng = CrawlEngine(
        SimParams.for_scale(args.scale),
        policy,
        out_dir=args.out,
        salt_max_group=args.salt_max_group,
    )
    if args.mode == "pipelined":
        if args.resume:
            raise SystemExit("--resume is a BFS-mode feature (see run_pipelined)")
        metrics = eng.run_pipelined()
    else:
        metrics = eng.run(resume=args.resume)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


def cmd_patch(args: argparse.Namespace) -> int:
    ray = _ray_session()
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import run_patch
    from spiderman_ray.policy import load_policy
    from spiderman_ray.simweb import SimParams

    # recover the behavioral config (splash routing, dirty words, dedup
    # mode) persisted beside the checkpoint — patching with defaults would
    # silently change semantics (e.g. re-create suppressed image children)
    policy = load_policy(args.out)
    eng = CrawlEngine(SimParams.for_scale(args.scale), policy, out_dir=args.out)
    print(json.dumps({"patched_per_generation": run_patch(eng)}))
    ray.shutdown()
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    ray = _ray_session()
    from spiderman_ray.pipelines.images import validate_summary

    print(validate_summary(args.images).to_pydict())
    ray.shutdown()
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc SQL over a crawl store: every gen-partitioned table
    registers as a DuckDB view (pages, details, images, crawl_order,
    dead_letters, hostmeta) and the statement runs against them — the
    operational complement of the fixed query registry. No Ray session:
    DuckDB scans the parquet parts directly."""
    import duckdb

    con = duckdb.connect()
    base = os.path.join(args.out, "tables")
    tables = sorted(os.listdir(base)) if os.path.isdir(base) else []
    for t in tables:
        glob_ = os.path.join(base, t, "gen=*", "*.parquet")
        import glob as _g

        if _g.glob(glob_):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob_}')"
            )
    df = con.execute(args.statement).fetchdf()
    if args.dest:
        df.to_csv(args.dest, index=False)
        print(json.dumps({"rows": len(df), "dest": args.dest,
                          "tables": tables}))
    else:
        print(df.to_string(index=False))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Compact a table's small per-task parts (one content-keyed part per
    gen= partition; idempotent; crash-repairing). See compact.py."""
    ray = _ray_session()
    from spiderman_ray.compact import compact_table

    tables = (
        [args.table]
        if args.table != "all"
        else sorted(os.listdir(os.path.join(args.out, "tables")))
    )
    out = {t: compact_table(args.out, t) for t in tables}
    summary = {
        t: {"compacted": sum(r["action"] == "compacted" for r in res),
            "skipped": sum(r["action"] == "skip" for r in res)}
        for t, res in out.items()
    }
    if args.gc_seen:
        from spiderman_ray.compact import gc_seen_snapshots

        gc = gc_seen_snapshots(args.out, keep=args.gc_seen_keep)
        summary["seen_gc"] = {
            "deleted": len(gc["deleted"]), "kept": len(gc["kept"]),
        }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Datafile-sink parity (SP/pipelines/pipelines_datafile.py): dump a
    crawled table as csv/parquet for debugging."""
    ray = _ray_session()
    import ray.data as rd

    from spiderman_ray.engine import read_table_all_gens

    tbl = read_table_all_gens(args.out, args.table)
    ds = rd.from_arrow(tbl)
    if args.fmt == "csv":
        ds.write_csv(args.dest)
    elif args.fmt == "jsonl":
        ds.write_json(args.dest)
    elif args.fmt == "txt":
        from spiderman_ray.sources.table_io import write_delimited

        write_delimited(tbl, args.dest, args.table, delimiter=args.delimiter)
    elif args.fmt == "sqlite":
        from spiderman_ray.sources.rdbms import write_table_rdbms

        res = write_table_rdbms(tbl, args.dest, args.table)
        print(json.dumps(res))
        ray.shutdown()
        return 0
    elif args.fmt in ("hbase", "mongo", "hdfs", "doris", "es", "kafka"):
        # external-store sink analogs (sources/sinks.py). Row stores get
        # the reference's str() coercion; binary payload columns are
        # dropped first (the reference's items never carry bytes —
        # attachments go through the FilesPipeline, not the row sinks).
        import pyarrow as pa

        from spiderman_ray.sources import sinks

        bins = [
            f.name
            for f in tbl.schema
            if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)
        ]
        if bins:
            tbl = tbl.drop_columns(bins)
            print(json.dumps({"dropped_binary_cols": bins}))
        if args.fmt == "es":
            if not args.text_col or args.text_col not in tbl.column_names:
                print(json.dumps({"error": "--text-col required for es export"}))
                ray.shutdown()
                return 2
            if args.id_col not in tbl.column_names:
                print(json.dumps({
                    "error": f"--id-col {args.id_col!r} not in table",
                    "columns": tbl.column_names,
                }))
                ray.shutdown()
                return 2
            res = sinks.write_index_es(
                rd.from_arrow(tbl),
                args.dest,
                args.table,
                id_col=args.id_col,
                text_col=args.text_col,
            )
        elif args.fmt == "kafka":
            # topic = the crawl/spider table name, key = tablename — the
            # reference's (topic=spider.name, key=item.tablename) shape
            res = sinks.write_topic_kafka(tbl, args.dest, args.table)
        else:
            writer = {
                "hbase": sinks.write_table_hbase,
                "mongo": sinks.write_table_mongo,
                "hdfs": sinks.write_table_hdfs,
                "doris": sinks.write_table_doris,
            }[args.fmt]
            res = writer(tbl, args.dest, args.table)
        res = {k: v for k, v in res.items() if k != "ddl"}
        print(json.dumps(res))
        ray.shutdown()
        return 0
    else:
        ds.write_parquet(args.dest)
    print(json.dumps({"rows": tbl.num_rows, "dest": args.dest}))
    ray.shutdown()
    return 0


def _load_registry() -> dict:
    """The query registry lives in __ray_entry__.py at the repo root (the
    driver contract); load it by path so the CLI works from any cwd."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(root, "__ray_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    return entry.queries()


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered data-pipeline query over a testdata-shaped
    directory and sink it as partitioned parquet (or csv/jsonl) — the
    operational surface for the SURVEY §2 / LLM-data operator registry.
    Listing: ``query --list``."""
    registry = _load_registry()
    if args.list or args.name is None:
        print(json.dumps(sorted(registry)))
        return 0
    if args.name not in registry:
        print(json.dumps({"error": f"unknown query {args.name!r}"}))
        return 1

    ray = _ray_session()
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = registry[args.name](args.sf)
    if isinstance(res, pd.DataFrame):
        res = rd.from_pandas(res)
    elif isinstance(res, pa.Table):
        res = rd.from_arrow(res)
    if args.dest:
        if args.fmt == "csv":
            res.write_csv(args.dest)
        elif args.fmt == "jsonl":
            res.write_json(args.dest)
        elif args.fmt == "sqlite":
            from spiderman_ray.sources.rdbms import write_table_rdbms

            out = write_table_rdbms(res, args.dest, args.name)
            print(json.dumps({"query": args.name, **out}))
            ray.shutdown()
            return 0
        else:
            res.write_parquet(args.dest)
        n = rd.read_parquet(args.dest).count() if args.fmt == "parquet" else None
        print(json.dumps({"query": args.name, "dest": args.dest,
                          "rows_written": n}))
    else:
        if getattr(args, "stats", False):
            # execute through THIS plan (count() plans separately), then
            # print the per-stage wall/CPU/rows audit — the "where did
            # the time go" surface for operator tuning
            res = res.materialize()
            print(json.dumps({"query": args.name, "rows": res.count()}))
            print(res.stats())
        else:
            print(json.dumps({"query": args.name, "rows": res.count()}))
    ray.shutdown()
    return 0


#: the corpus-health report composition: cheap dashboard rows by default,
#: the dedup/eval diagnostics (minhash machinery, zlib funnel) with --full
_REPORT_SECTIONS = ("source_quality_report", "length_buckets", "data_splits",
                    "mixture_weights", "vocab_growth",
                    "source_distinct_shingles", "gopher_summary",
                    "length_quality_curve")
_REPORT_FULL = ("curation_funnel", "dup_cluster_sizes", "source_dup_rates",
                "source_novelty", "simhash_eval", "minhash_eval",
                "minhash_threshold_sweep", "split_leakage", "recipe_curate")


def cmd_report(args: argparse.Namespace) -> int:
    """One corpus-health report over an sf dir — the publish-before-
    training read-out composing the dashboard ops (per-source totals,
    length histogram, split manifest, mixture weights; ``--full`` adds
    the curation funnel, duplication profile and detector evals). Each
    section is a registered gate query, so every number in the report is
    independently hash-verified against its own oracle."""
    registry = _load_registry()
    ray = _ray_session()
    import pandas as pd
    import pyarrow as pa

    names = _REPORT_SECTIONS + (_REPORT_FULL if args.full else ())
    report: dict = {"sf": args.sf, "sections": {}}
    for name in names:
        res = registry[name](args.sf)
        if not isinstance(res, (pd.DataFrame, pa.Table)):
            res = res.to_pandas()
        if isinstance(res, pa.Table):
            res = res.to_pandas()
        res = res.sort_values(list(res.columns)).reset_index(drop=True)
        report["sections"][name] = res.to_dict("records")
    out = json.dumps(report)
    if args.dest:
        with open(args.dest, "w") as f:
            f.write(out + "\n")
        print(json.dumps({"report": args.dest, "sections": sorted(names)}))
    else:
        print(out)
    ray.shutdown()
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    """Build a persisted index artifact: --kind dedup (fps + LSH bands;
    text.build_dedup_index) or --kind ann (IVF centroids + cluster-
    partitioned normalized vectors; vectors.build_ann_index) — the state
    a production incremental/query pipeline maintains so runs join
    stored columns instead of re-deriving the corpus."""
    ray = _ray_session()
    if args.kind == "ann":
        from spiderman_ray.pipelines.vectors import build_ann_index

        print(json.dumps(build_ann_index(args.sf, args.dest)))
    elif args.kind == "shards":
        from spiderman_ray.pipelines.bpe import write_training_shards

        print(json.dumps(write_training_shards(args.sf, args.dest)))
    elif args.kind == "bloom":
        from spiderman_ray.pipelines.text import build_bloom_index

        print(json.dumps(build_bloom_index(args.sf, args.dest)))
    else:
        from spiderman_ray.pipelines.text import build_dedup_index

        print(json.dumps(build_dedup_index(args.sf, args.dest, args.base_pct)))
    ray.shutdown()
    return 0


def cmd_new(args: argparse.Namespace) -> int:
    """Scaffold a new crawler (easy_scrapy.py new/patch analog): emits a
    runnable CrawlSpec module + schema + patch stub. No Ray session."""
    from spiderman_ray.scaffold import new

    try:
        paths = new(
            args.name,
            args.dir,
            describe=args.describe,
            author=args.author,
            patch_only=args.patch_only,
        )
    except (FileExistsError, NameError) as ex:
        print(json.dumps({"error": str(ex)}))
        return 1
    print(json.dumps({"created": sorted(paths.values())}))
    return 0


def cmd_oracle(args: argparse.Namespace) -> int:
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.simweb import SimParams

    res = run_oracle(SimParams.for_scale(args.scale))
    print(json.dumps({k: v for k, v in res.metrics.items() if k != "host_vclock_ms"}))
    return 0


def cmd_tasks(args: argparse.Namespace) -> int:
    from spiderman_ray.control import TaskRegistry

    tasks = TaskRegistry().get_tasks(args.spider, args.sort)
    print(json.dumps({"total": len(tasks), "tasks": tasks}))
    return 0


def cmd_kill(args: argparse.Namespace) -> int:
    from spiderman_ray.control import kill_task

    res = kill_task(args.id)
    print(json.dumps(res))
    return 0 if res["returncode"] == 0 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="spiderman_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the crawl engine over the simulated web")
    c.add_argument("--scale", default="t1", help="t1 | t2 | bench")
    c.add_argument("--out", default="/tmp/spiderman_run")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--bloom", action="store_true", help="bloom seen-set mode")
    c.add_argument(
        "--dedup-mode", default="exact", choices=["exact", "bloom", "cuckoo"],
        help="seen-set mode (cuckoo supports deletion for patch re-offers)",
    )
    c.add_argument("--no-dedup", action="store_true", help="dont_filter mode")
    c.add_argument(
        "--mode", default="bfs", choices=["bfs", "pipelined"],
        help="bfs = conformance generation barrier (default); pipelined = "
        "reference-FIFO throughput mode (engine.run_pipelined)",
    )
    c.add_argument("--salt-max-group", type=int, default=None)
    c.add_argument("--max-generations", type=int, default=16)
    c.add_argument("--splash-callbacks", default=None,
                   help="comma list of callbacks to route through the "
                   "render path (scrapy-splash analog)")
    c.add_argument("--splash-images", type=int, default=0,
                   help="0 suppresses image children of rendered pages "
                   "(reference default)")
    c.set_defaults(fn=cmd_crawl)

    pt = sub.add_parser(
        "patch", help="re-crawl anything scheduled but missing from the sinks"
    )
    pt.add_argument("--scale", default="t1")
    pt.add_argument("--out", required=True)
    pt.set_defaults(fn=cmd_patch)

    v = sub.add_parser("validate", help="decode/validate an images table")
    v.add_argument("--images", required=True)
    v.set_defaults(fn=cmd_validate)

    sq = sub.add_parser("sql", help="ad-hoc DuckDB SQL over a crawl store's tables")
    sq.add_argument("statement", help="SQL; crawl tables are pre-registered views")
    sq.add_argument("--out", required=True, help="crawl output dir")
    sq.add_argument("--dest", default=None, help="write result csv here (omit = print)")
    sq.set_defaults(fn=cmd_sql)

    cp = sub.add_parser(
        "compact", help="merge small per-task parts (one part per gen= dir)"
    )
    cp.add_argument("--out", required=True, help="crawl output dir")
    cp.add_argument("--table", default="all")
    cp.add_argument("--gc-seen", action="store_true",
                    help="also GC seen-set snapshots older than the resume "
                    "point (manifest-aware; see compact.gc_seen_snapshots)")
    cp.add_argument("--gc-seen-keep", type=int, default=1,
                    help="complete generations of seen snapshots to keep")
    cp.set_defaults(fn=cmd_compact)

    e = sub.add_parser(
        "export",
        help="export a crawled table to csv/parquet or an external-store "
        "sink analog (hbase/mongo/hdfs/doris/es/kafka)",
    )
    e.add_argument("--out", required=True, help="crawl output dir")
    e.add_argument("--table", default="pages")
    e.add_argument("--fmt", default="csv",
                   choices=["csv", "parquet", "jsonl", "txt", "sqlite",
                            "hbase", "mongo", "hdfs", "doris", "es", "kafka"])
    e.add_argument("--delimiter", default=",", help="txt format delimiter "
                   "(DATAFILE_DELIMITER parity)")
    e.add_argument("--dest", required=True)
    e.add_argument("--id-col", default="url",
                   help="es export: document id column")
    e.add_argument("--text-col", default=None,
                   help="es export: text column to index (required)")
    e.set_defaults(fn=cmd_export)

    q = sub.add_parser(
        "query", help="run a registered data-pipeline query over an sf dir"
    )
    q.add_argument("name", nargs="?", default=None, help="query name (see --list)")
    q.add_argument("--sf", default="/root/testdata/sf0.01", help="input table dir")
    q.add_argument("--dest", default=None, help="sink dir (omit = count only)")
    q.add_argument("--fmt", default="parquet",
                   choices=["parquet", "csv", "jsonl", "sqlite"])
    q.add_argument("--list", action="store_true", help="list query names")
    q.add_argument("--stats", action="store_true",
                   help="print per-stage Dataset.stats() after running")
    q.set_defaults(fn=cmd_query)

    rp = sub.add_parser(
        "report", help="one corpus-health JSON report over an sf dir"
    )
    rp.add_argument("--sf", default="/root/testdata/sf0.01", help="input table dir")
    rp.add_argument("--dest", default=None, help="write the JSON here (omit = stdout)")
    rp.add_argument("--full", action="store_true",
                    help="add the funnel/duplication/eval diagnostics")
    rp.set_defaults(fn=cmd_report)

    ix = sub.add_parser(
        "index", help="persist a base snapshot's dedup index (fps + LSH bands)"
    )
    ix.add_argument("--sf", default="/root/testdata/sf0.01", help="input table dir")
    ix.add_argument("--dest", required=True, help="index output dir")
    ix.add_argument("--base-pct", type=int, default=50,
                    help="hash_sample base split percentile (dedup kind)")
    ix.add_argument("--kind", choices=["dedup", "ann", "shards", "bloom"],
                    default="dedup",
                    help="dedup = fps + LSH bands; ann = IVF index; "
                         "shards = tokenized training shards (resumable); "
                         "bloom = decontamination bitmap")
    ix.set_defaults(fn=cmd_index)

    n = sub.add_parser("new", help="scaffold a new crawler spec (easy_scrapy analog)")
    n.add_argument("name", help="spider name (Python identifier)")
    n.add_argument("--dir", default=".", help="destination directory")
    n.add_argument("--describe", default="", help="one-line description")
    n.add_argument("--author", default="", help="author stamp")
    n.add_argument("--patch-only", action="store_true",
                   help="only generate the patch job (easy_scrapy patch analog)")
    n.set_defaults(fn=cmd_new)

    o = sub.add_parser("oracle", help="run the reference-oracle simulator")
    o.add_argument("--scale", default="t1")
    o.set_defaults(fn=cmd_oracle)

    s = sub.add_parser("serve", help="REST control plane (api.py analog)")
    s.add_argument("--port", type=int, default=2021)
    s.set_defaults(fn=lambda a: __import__(
        "spiderman_ray.control", fromlist=["serve"]).serve(a.port) or 0)

    t = sub.add_parser("tasks", help="list registered control-plane tasks")
    t.add_argument("--spider", default=None)
    t.add_argument("--sort", default="spider", choices=["spider", "host"])
    t.set_defaults(fn=cmd_tasks)

    k = sub.add_parser("kill", help="terminate a control-plane task")
    k.add_argument("--id", required=True)
    k.set_defaults(fn=cmd_kill)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
