"""Small-file compaction: content preservation, idempotency, crash repair."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

import pytest

pytestmark = pytest.mark.slow


def _make_store(tmp_path, n_parts=4, rows_per_part=100):
    """A tables/pages store with one gen= partition split into small parts
    (what a many-task generation leaves behind)."""
    gen_dir = os.path.join(str(tmp_path), "tables", "pages", "gen=0")
    os.makedirs(gen_dir)
    for p in range(n_parts):
        t = pa.table(
            {
                "seq": pa.array(range(p * rows_per_part, (p + 1) * rows_per_part), pa.int64()),
                "title": pa.array([f"row-{p}-{i}" for i in range(rows_per_part)]),
            }
        )
        pq.write_table(t, os.path.join(gen_dir, f"part-g0-{p:016x}.parquet"))
    return str(tmp_path), gen_dir


def _read_all(gen_dir):
    parts = sorted(f for f in os.listdir(gen_dir) if f.endswith(".parquet"))
    t = pa.concat_tables([pq.read_table(os.path.join(gen_dir, f)) for f in parts])
    return t.sort_by("seq")


def test_compact_preserves_rows_and_is_idempotent(tmp_path):
    from spiderman_ray.compact import compact_table

    out, gen_dir = _make_store(tmp_path)
    before = _read_all(gen_dir)
    res = compact_table(out, "pages")
    assert [r["action"] for r in res] == ["compacted"]
    parts = [f for f in os.listdir(gen_dir) if f.endswith(".parquet")]
    assert len(parts) == 1 and "compact" in parts[0]
    assert _read_all(gen_dir).equals(before)

    # second run: single-part partitions are skipped untouched
    res2 = compact_table(out, "pages")
    assert [r["action"] for r in res2] == ["skip"]
    assert _read_all(gen_dir).equals(before)


def test_compact_repair_rolls_forward_and_back(tmp_path):
    from spiderman_ray.compact import compact_partition, repair_partitions

    out, gen_dir = _make_store(tmp_path)
    before = _read_all(gen_dir)
    table_dir = os.path.dirname(gen_dir)

    # crash BEFORE the swap: complete stage, live dir intact -> stage dropped
    stage = gen_dir + ".compact"
    os.makedirs(stage)
    pq.write_table(_read_all(gen_dir), os.path.join(stage, "part-g0-compact-x.parquet"))
    assert repair_partitions(table_dir) == ["gen=0.compact"]
    assert not os.path.isdir(stage) and _read_all(gen_dir).equals(before)

    # crash MID-swap: live moved aside, stage complete -> rolled forward
    os.makedirs(stage)
    pq.write_table(before, os.path.join(stage, "part-g0-compact-x.parquet"))
    os.replace(gen_dir, gen_dir + ".old")
    repair_partitions(table_dir)
    assert not os.path.isdir(stage) and not os.path.isdir(gen_dir + ".old")
    assert _read_all(gen_dir).equals(before)
    assert len([f for f in os.listdir(gen_dir) if f.endswith(".parquet")]) == 1

    # crash AFTER the swap (backup not yet deleted) -> backup dropped
    shutil.copytree(gen_dir, gen_dir + ".old")
    repair_partitions(table_dir)
    assert not os.path.isdir(gen_dir + ".old") and _read_all(gen_dir).equals(before)

    # empty stage (crashed while writing) + live intact -> rolled back
    os.makedirs(stage)
    open(os.path.join(stage, "part-g0-compact-y.parquet.tmp"), "wb").close()
    repair_partitions(table_dir)
    assert not os.path.isdir(stage) and _read_all(gen_dir).equals(before)

    # compact_partition on the repaired single-part partition: skip
    assert compact_partition(gen_dir)["action"] == "skip"


def test_compact_crawl_store_roundtrip(tmp_path, ray_session):
    """Split a real t1 crawl's pages partition into many parts, compact via
    the CLI path, and assert the resume readers see identical content."""
    import ray

    from spiderman_ray.compact import compact_table
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.simweb import SimParams

    assert ray.is_initialized()
    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), out_dir=out)
    eng.run()
    eng._pool.shutdown()

    before = read_table_all_gens(out, "pages").sort_by("seq")
    gen_dir = os.path.join(out, "tables", "pages", "gen=0")
    parts = [f for f in os.listdir(gen_dir) if f.endswith(".parquet")]
    full = pq.read_table(os.path.join(gen_dir, parts[0]))
    for f in parts:
        os.remove(os.path.join(gen_dir, f))
    for i in range(0, full.num_rows):  # one row per part: worst case
        pq.write_table(full.slice(i, 1), os.path.join(gen_dir, f"part-g0-{i:016x}.parquet"))

    res = compact_table(out, "pages")
    by_dir = {os.path.basename(r["dir"]): r["action"] for r in res}
    assert by_dir["gen=0"] == "compacted"
    after = read_table_all_gens(out, "pages").sort_by("seq")
    assert after.equals(before)


def test_cli_sql_over_crawl_store(tmp_path, ray_session):
    """cli sql registers every gen-partitioned table as a view and runs
    ad-hoc DuckDB against the store (no Ray session needed)."""
    import json
    import subprocess
    import sys

    import ray

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.simweb import SimParams

    assert ray.is_initialized()
    out = str(tmp_path / "run")
    eng = CrawlEngine(SimParams.for_scale("t1"), out_dir=out)
    m = eng.run()
    eng._pool.shutdown()

    dest = str(tmp_path / "res.csv")
    r = subprocess.run(
        [sys.executable, "-m", "spiderman_ray.cli", "sql",
         "SELECT COUNT(*) AS n FROM crawl_order", "--out", out, "--dest", dest],
        capture_output=True, text=True, check=True,
    )
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows"] == 1
    import pandas as pd

    assert int(pd.read_csv(dest)["n"][0]) == m["crawled"]


def test_gc_seen_then_kill_resume_bit_identical(tmp_path):
    """Seen-snapshot GC keeps the resume point: kill after gen 1, compact +
    GC the snapshots, resume — every table and the final seen set still
    bit-match an uninterrupted run."""
    import pandas as pd

    from spiderman_ray.compact import compact_table, gc_seen_snapshots
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.policy import CrawlPolicy
    from spiderman_ray.simweb import SimParams

    params = SimParams.for_scale("t1")
    out_a = str(tmp_path / "full")
    out_b = str(tmp_path / "resumed")
    m_full = CrawlEngine(params, CrawlPolicy(), out_dir=out_a).run()

    CrawlEngine(params, CrawlPolicy(max_generations=2), out_dir=out_b).run()
    # mid-crawl maintenance: table compaction + manifest-aware snapshot GC
    for t in ("pages", "details", "images"):
        compact_table(out_b, t)
    gc = gc_seen_snapshots(out_b)
    assert gc["last_complete"] == 1
    assert gc["deleted"] == ["gen-0"] and "gen-1" in gc["kept"]
    assert sorted(os.listdir(os.path.join(out_b, "seen"))) == ["gen-1"]

    eng2 = CrawlEngine(params, CrawlPolicy(), out_dir=out_b)
    m_res = eng2.run(resume=True)
    assert m_res["generations"] == m_full["generations"]
    for t in ("pages", "details", "images", "dead_letters", "crawl_order"):
        a = read_table_all_gens(out_a, t).to_pandas().sort_values(
            ["generation", "seq"]).reset_index(drop=True)
        b = read_table_all_gens(out_b, t).to_pandas().sort_values(
            ["generation", "seq"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    fps = set().union(*(set(d.tolist()) for d in eng2._pool.dump()))
    assert fps == run_oracle(params).seen_fps


def test_gc_seen_sweeps_interrupted_delete(tmp_path):
    """A .gc-tmp leftover (crash between rename and rmtree) is swept, and
    resume walks never see a half-deleted snapshot dir."""
    import json

    from spiderman_ray.compact import gc_seen_snapshots

    seen = tmp_path / "seen"
    for g in range(3):
        (seen / f"gen-{g}").mkdir(parents=True)
        (seen / f"gen-{g}" / "shard-0.npz").write_bytes(b"x")
    (seen / "gen-0.gc-tmp").mkdir()
    mdir = tmp_path / "manifests"
    mdir.mkdir()
    for g in range(3):
        (mdir / f"gen-{g}.json").write_text(json.dumps({"complete": True}))
    gc = gc_seen_snapshots(str(tmp_path))
    assert gc["last_complete"] == 2
    assert sorted(os.listdir(seen)) == ["gen-2"]
    assert set(gc["deleted"]) == {"gen-0", "gen-0.gc-tmp", "gen-1"}
