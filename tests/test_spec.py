"""CrawlSpec extension surface: custom parsers/seeds without engine changes."""

import pandas as pd
import pytest

from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams

pytestmark = pytest.mark.usefixtures("ray_session")


def shouty_list_parse(resp, req):
    """Custom parser: uppercased titles (module-level so it pickles)."""
    from spiderman_ray.parsers import parse_list

    rows, reqs = parse_list(resp, req)
    for r in rows:
        r["title"] = r["title"].upper()
    return rows, reqs


def test_custom_parser_spec(tmp_path):
    from spiderman_ray.engine import read_table_all_gens
    from spiderman_ray.parsers import PARSERS
    from spiderman_ray.spec import CrawlSpec, build_engine

    spec = CrawlSpec(
        name="shouty",
        params=SimParams.for_scale("t1"),
        policy=CrawlPolicy(),
        parsers={**PARSERS, "list": shouty_list_parse},
    )
    out = str(tmp_path / "shouty")
    eng = build_engine(spec, out)
    m = eng.run()
    assert m["pages"] > 0
    pages = read_table_all_gens(out, "pages").to_pandas()
    assert (pages["title"].str.upper() == pages["title"]).all()
    eng._pool.shutdown()


def test_custom_seed_fn(tmp_path):
    from spiderman_ray.oracle import seed_requests
    from spiderman_ray.spec import CrawlSpec, build_engine

    def two_seeds(web):
        return seed_requests(web)[:2]

    spec = CrawlSpec(params=SimParams.for_scale("t1"), seed_fn=two_seeds)
    eng = build_engine(spec, str(tmp_path / "two"))
    m = eng.run()
    # only pages 1-2 crawled at gen 0
    assert m["generations"] >= 1
    from spiderman_ray.engine import read_table_all_gens

    co = read_table_all_gens(str(tmp_path / "two"), "crawl_order").to_pandas()
    assert (co[co["generation"] == 0]["url"].str.contains("/list/")).all()
    assert len(co[co["generation"] == 0]) == 2
    eng._pool.shutdown()


def test_meta_table():
    from spiderman_ray.meta import meta_table

    t = meta_table().to_pandas()
    assert set(t["tb"]) == {"images", "pages", "details", "dead_letters", "frontier"}
    img_cols = t[t["tb"] == "images"].sort_values("col_px")["col"].tolist()
    assert img_cols[:7] == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def test_price_monitor(tmp_path):
    """Monitor predicate over a crawled pages table (kafka_mon analog)."""
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.pipelines.monitor import price_monitor

    out = str(tmp_path / "mon")
    eng = CrawlEngine(SimParams.for_scale("t1"), CrawlPolicy(), out_dir=out)
    eng.run()
    pages = read_table_all_gens(out, "pages").to_pandas()
    thr = int(pd.to_numeric(pages["price"]).median())
    hits = price_monitor(out + "/tables/pages", threshold=thr).to_pandas()
    assert 0 < len(hits) < len(pages)
    assert (pd.to_numeric(hits["price"]) < thr).all()
    eng._pool.shutdown()
