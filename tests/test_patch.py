"""Patch-job semantics: rebuild lost work from the checkpointed frontier by
anti-join against the sink log (zhifang_job_patch model)."""

import shutil

import pandas as pd
import pytest

from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams

pytestmark = pytest.mark.usefixtures("ray_session")


def _tables(out):
    from spiderman_ray.engine import read_table_all_gens

    return {
        t: read_table_all_gens(out, t).to_pandas().sort_values(["generation", "seq"]).reset_index(drop=True)
        for t in ("pages", "details", "images", "crawl_order", "dead_letters")
    }


def test_patch_restores_lost_generation(tmp_path):
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import find_residual, run_patch

    params = SimParams.for_scale("t1")
    out = str(tmp_path / "run")
    eng = CrawlEngine(params, CrawlPolicy(), out_dir=out)
    eng.run()
    eng._pool.shutdown()
    before = _tables(out)

    # nothing missing -> nothing to do
    assert find_residual(out, 2).num_rows == 0
    assert run_patch(eng) == {}

    # simulate data loss: generation 2 (images) vanishes from every sink
    for t in ("images", "crawl_order", "dead_letters"):
        shutil.rmtree(f"{out}/tables/{t}/gen=2", ignore_errors=True)
    assert find_residual(out, 2).num_rows > 0

    stats = run_patch(eng)
    assert 2 in stats and stats[2] > 0

    after = _tables(out)
    for t, df in before.items():
        pd.testing.assert_frame_equal(
            df.drop(columns=["vts_ms"], errors="ignore"),
            after[t].drop(columns=["vts_ms"], errors="ignore"),
        )


def test_patch_repairs_mid_depth_loss_and_descendants(tmp_path):
    """Lose generation 1 (details) INCLUDING its emitted frontier for gen 2:
    the patch must re-crawl details and then their image children."""
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import run_patch

    params = SimParams.for_scale("t1")
    out = str(tmp_path / "run")
    eng = CrawlEngine(params, CrawlPolicy(), out_dir=out)
    eng.run()
    eng._pool.shutdown()
    before = _tables(out)

    for t in ("details", "crawl_order", "dead_letters"):
        shutil.rmtree(f"{out}/tables/{t}/gen=1", ignore_errors=True)
    for t in ("images", "crawl_order", "dead_letters"):
        shutil.rmtree(f"{out}/tables/{t}/gen=2", ignore_errors=True)
    shutil.rmtree(f"{out}/frontier/gen=2", ignore_errors=True)

    stats = run_patch(eng)
    assert stats.get(1, 0) > 0 and stats.get(2, 0) > 0

    after = _tables(out)
    for t, df in before.items():
        pd.testing.assert_frame_equal(
            df.drop(columns=["vts_ms"], errors="ignore"),
            after[t].drop(columns=["vts_ms"], errors="ignore"),
        )


def test_patch_cuckoo_deletion_mode(tmp_path):
    """In cuckoo mode the patch job restores the seen snapshot, DELETES the
    residual fps and re-offers through the same pool (no fresh-pool
    workaround) — repaired tables equal the undamaged run."""
    import shutil as _sh

    from spiderman_ray.engine import CrawlEngine, _gen_dir
    from spiderman_ray.patch import find_residual, run_patch

    params = SimParams.for_scale("t1")
    policy = CrawlPolicy(dedup_mode="cuckoo", bloom_mem_mb=1, num_shards=3)
    out = str(tmp_path / "ckpatch")
    eng = CrawlEngine(params, policy, out_dir=out)
    eng.run()
    eng._pool.shutdown()
    before = _tables(out)

    import os

    for t in ("images", "crawl_order", "dead_letters"):
        d = os.path.join(out, "tables", t, "gen=2")
        if os.path.isdir(d):
            _sh.rmtree(d)
    assert find_residual(out, 2).num_rows > 0

    stats = run_patch(eng)
    assert stats and 2 in stats
    after = _tables(out)
    for t, df in before.items():
        pd.testing.assert_frame_equal(df, after[t])


def test_patch_repairs_lost_attachment_table(tmp_path):
    """Losing ONLY the images table (crawl_order intact) must still repair —
    the DownLoad.make_job attachment-redo case: the fetch log says done,
    the sink disagrees."""
    import os
    import shutil as _sh

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import find_lost_attachments, find_residual, run_patch

    params = SimParams.for_scale("t1")
    out = str(tmp_path / "attach")
    eng = CrawlEngine(params, CrawlPolicy(), out_dir=out)
    eng.run()
    eng._pool.shutdown()
    before = _tables(out)

    _sh.rmtree(os.path.join(out, "tables", "images", "gen=2"))
    assert find_residual(out, 2).num_rows == 0  # the plain anti-join is blind
    assert find_lost_attachments(out, 2).num_rows > 0  # the integrity check is not

    stats = run_patch(eng)
    assert stats.get(2, 0) > 0
    after = _tables(out)
    for t, df in before.items():
        pd.testing.assert_frame_equal(df, after[t])


def test_patch_under_splash_routing(tmp_path):
    """Patch jobs re-fetch through the SAME splash routing: a rendered
    detail generation lost from the sinks is rebuilt identically (render
    path restores content; images stay suppressed with images=0)."""
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import find_residual, run_patch

    params = SimParams.for_scale("t1", render_rate=0.5)
    policy = CrawlPolicy(splash={"callbacks": ("detail",), "wait": 2})
    out = str(tmp_path / "splashrun")
    eng = CrawlEngine(params, policy, out_dir=out)
    m = eng.run()
    eng._pool.shutdown()
    assert m["details"] > 0 and m["images"] == 0  # images suppressed
    before = _tables(out)

    shutil.rmtree(f"{out}/tables/details/gen=1", ignore_errors=True)
    shutil.rmtree(f"{out}/tables/crawl_order/gen=1", ignore_errors=True)
    assert find_residual(out, 1).num_rows > 0
    stats = run_patch(eng)
    assert stats.get(1, 0) > 0
    after = _tables(out)
    for t, df in before.items():
        pd.testing.assert_frame_equal(
            df.drop(columns=["vts_ms"], errors="ignore"),
            after[t].drop(columns=["vts_ms"], errors="ignore"),
        )


def test_policy_persisted_and_loaded_for_patch(tmp_path):
    """CrawlPolicy is checkpointed beside the tables and load_policy
    round-trips it (tuple fields restored), so a LATER process (the CLI
    patch path) patches under the original semantics."""
    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.patch import run_patch
    from spiderman_ray.policy import load_policy

    params = SimParams.for_scale("t1", render_rate=0.5)
    policy = CrawlPolicy(splash={"callbacks": ("detail",), "wait": 2},
                         dirty_words=("blocked",))
    out = str(tmp_path / "persist")
    eng = CrawlEngine(params, policy, out_dir=out)
    m = eng.run()
    eng._pool.shutdown()
    assert m["images"] == 0

    loaded = load_policy(out)
    assert loaded == policy  # dataclass equality incl. restored tuples

    # fresh engine as the CLI would build it: loaded policy, lost gen
    shutil.rmtree(f"{out}/tables/details/gen=1", ignore_errors=True)
    shutil.rmtree(f"{out}/tables/crawl_order/gen=1", ignore_errors=True)
    eng2 = CrawlEngine(params, loaded, out_dir=out)
    stats = run_patch(eng2)
    assert stats.get(1, 0) > 0
    from spiderman_ray.engine import read_table_all_gens

    assert read_table_all_gens(out, "images").num_rows == 0  # still suppressed
