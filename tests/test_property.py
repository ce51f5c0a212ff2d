"""Randomized conformance: engine ≡ oracle across site-graph parameter space
(SURVEY.md §5.5) — varying fan-out, duplicate-link density, host skew,
failure rates, dedup policy. Each case is a full end-to-end crawl compared
on order, counts and seen set."""

import pytest

from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams

pytestmark = [pytest.mark.usefixtures("ray_session"), pytest.mark.slow]

CASES = [
    # heavy duplicate links + image dups
    dict(
        params=SimParams(pages=6, details=5, images=2, hosts=2, img_hosts=2,
                         dup_link_rate=0.6, dup_image_rate=0.5, seed=101),
        policy=CrawlPolicy(),
    ),
    # extreme skew: single hot host takes everything
    dict(
        params=SimParams(pages=8, details=3, images=1, hosts=4, img_hosts=1,
                         hot_host_share=0.95, seed=202),
        policy=CrawlPolicy(),
    ),
    # high failure/dead rates + min-size path + bloom dedup
    dict(
        params=SimParams(pages=6, details=4, images=2, hosts=3, img_hosts=2,
                         fail_rate=0.3, dead_rate=0.1, small_body_rate=0.1, seed=303),
        policy=CrawlPolicy(min_size=512, dedup_mode="bloom", bloom_mem_mb=1, num_shards=2),
    ),
    # dedup off for details only (mixed dont_filter flags)
    dict(
        params=SimParams(pages=5, details=4, images=2, hosts=3, img_hosts=2,
                         dup_link_rate=0.4, seed=404),
        policy=CrawlPolicy(dedup_overrides={"detail": False}),
    ),
    # everything private (robots wall)
    dict(
        params=SimParams(pages=4, details=4, images=2, hosts=2, img_hosts=1,
                         private_rate=0.9, seed=505),
        policy=CrawlPolicy(),
    ),
]


@pytest.mark.parametrize("case", CASES, ids=[f"case{i}" for i in range(len(CASES))])
def test_engine_equals_oracle(case, tmp_path):
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.oracle import run_oracle

    o = run_oracle(case["params"], case["policy"])
    out = str(tmp_path / "run")
    eng = CrawlEngine(case["params"], case["policy"], out_dir=out)
    m = eng.run()

    assert {k: m[k] for k in ("crawled", "pages", "details", "images", "dead")} == {
        k: o.metrics[k] for k in ("crawled", "pages", "details", "images", "dead")
    }
    co = (
        read_table_all_gens(out, "crawl_order")
        .to_pandas()
        .sort_values(["generation", "seq"])
    )
    assert co["url"].tolist() == [c["url"] for c in o.crawl_order]
    assert co["attempts"].tolist() == [c["attempts"] for c in o.crawl_order]
    if case["policy"].dedup_mode == "bloom":
        for got, want in zip(eng._pool.dump(), o.seen_bitmaps):
            assert (got == want).all()
    else:
        fps = set().union(*(set(d.tolist()) for d in eng._pool.dump()))
        assert fps == o.seen_fps
    eng._pool.shutdown()
