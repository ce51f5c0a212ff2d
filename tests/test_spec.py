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
    # easy_meta.py:23-34 column parity: comment/author/addtime/insertime
    assert {"spider_comment", "col_comment", "author", "addtime", "insertime"} <= set(t.columns)
    assert (t["spider_comment"] != "").all() and (t["author"] != "").all()
    assert (t[t["col"] == "phash"]["col_comment"] == "64-bit perceptual hash").all()


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


def test_crawl_host_stats(tmp_path):
    """Per-host metrics aggregate ≡ sequential recompute over the oracle's
    crawl_order + dead_letters (fetched count, attempts incl. dead letters,
    vclock high-water mark in integer µs, dead-letter count)."""
    import math

    from spiderman_ray.engine import CrawlEngine
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.pipelines.monitor import crawl_host_stats

    params = SimParams.for_scale("t1")
    o = run_oracle(params, CrawlPolicy())
    out = str(tmp_path / "hs")
    eng = CrawlEngine(params, CrawlPolicy(), out_dir=out)
    eng.run()

    exp: dict[str, list[int]] = {}
    for r in o.crawl_order:
        s = exp.setdefault(r["host"], [0, 0, 0, 0])
        s[0] += 1
        s[1] += int(r["attempts"])
        s[2] = max(s[2], int(math.floor(r["vts_ms"] * 1000.0 + 0.5)))
    for r in o.dead_letters:
        s = exp.setdefault(r["host"], [0, 0, 0, 0])
        s[1] += int(r["attempts"])
        s[3] += 1
    assert o.dead_letters, "t1 must exercise the dead-letter leg"

    got = crawl_host_stats(out).to_pandas().set_index("host").sort_index()
    assert sorted(exp) == got.index.tolist()
    for h, (nf, at, vts, nd) in exp.items():
        row = got.loc[h]
        assert (row["n_fetched"], row["attempts_total"], row["vts_max_us"],
                row["n_dead"]) == (nf, at, vts, nd), h
    eng._pool.shutdown()


def priority_list_parse(resp, req):
    """Custom parser: image-poor details first? Demo: priority from the
    target detail ordinal (module-level so it pickles into Ray tasks)."""
    from spiderman_ray.parsers import parse_list

    rows, reqs = parse_list(resp, req)
    for r in reqs:
        r["priority"] = int(r["url"].rsplit("-", 1)[1]) % 3  # 0..2
    return rows, reqs


def test_priority_frontier_conformance(tmp_path):
    """Non-zero priorities reorder fetches within a generation; engine must
    match the priority-queue oracle on order AND politeness slots."""
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.parsers import PARSERS

    params = SimParams.for_scale("t1")
    parsers = {**PARSERS, "list": priority_list_parse}
    delays = {"h0.shop.example": 50}
    o = run_oracle(params, CrawlPolicy(), delays_ms=delays, parsers=parsers)
    out = str(tmp_path / "prio")
    eng = CrawlEngine(
        params, CrawlPolicy(), out_dir=out, delays_ms=delays, parsers=parsers
    )
    eng.run()
    # compare in the oracle's (generation, -priority, seq) order — need the
    # priority back: join from the frontier checkpoint
    import pyarrow.parquet as pq
    import pandas as pd
    import os

    fparts = []
    for g in (0, 1, 2):
        d = os.path.join(out, "frontier", f"gen={g}")
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    fparts.append(pq.read_table(os.path.join(d, f)).to_pandas())
    fr = pd.concat(fparts)[["fp", "priority", "generation"]].drop_duplicates(["fp", "generation"])
    co = read_table_all_gens(out, "crawl_order").to_pandas().merge(
        fr, on=["fp", "generation"], how="left"
    )
    co = co.sort_values(
        ["generation", "priority", "seq"], ascending=[True, False, True]
    ).reset_index(drop=True)
    assert co["url"].tolist() == [c["url"] for c in o.crawl_order]
    assert co["vts_ms"].tolist() == [c["vts_ms"] for c in o.crawl_order]
    # priorities actually reordered something (not a vacuous test)
    assert (co[co["generation"] == 1]["priority"].to_numpy() != 0).any()
    eng._pool.shutdown()


def test_priority_with_dont_filter_mix(tmp_path):
    """Regression: priority order must survive the dedup/dont_filter merge
    inside fetch groups (was re-sorted by seq only)."""
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.parsers import PARSERS

    params = SimParams.for_scale("t1")
    parsers = {**PARSERS, "list": priority_list_parse}
    policy = CrawlPolicy(dedup_overrides={"detail": False})
    delays = {"h0.shop.example": 30}
    o = run_oracle(params, policy, delays_ms=delays, parsers=parsers)
    out = str(tmp_path / "pmix")
    eng = CrawlEngine(params, policy, out_dir=out, delays_ms=delays, parsers=parsers)
    eng.run()
    co = read_table_all_gens(out, "crawl_order").to_pandas()
    # politeness slots depend on fetch ORDER within the host group — they
    # only match the oracle if priority ordering survived the dedup merge
    want = sorted(
        ((c["generation"], c["url"], c["vts_ms"]) for c in o.crawl_order)
    )
    got = sorted(zip(co["generation"], co["url"], co["vts_ms"]))
    assert got == want
    eng._pool.shutdown()


def deep_chain_parse(resp, req):
    """Deep graph: list pages also link to the NEXT page as a 'list' child,
    building a chain deeper than the seq encoding's naive 3-level budget."""
    from spiderman_ray.parsers import make_request, child_seq, parse_list

    rows, reqs = parse_list(resp, req)
    p = int(req["url"].rsplit("/", 1)[1])
    if p < 8:  # chain depth 8
        host = req["url"].split("/list/")[0]
        reqs.append(
            make_request(
                f"{host}/list/{p + 1}", "list",
                generation=req["generation"] + 1,
                seq=child_seq(req["seq"], len(reqs)),
                pagenum=p + 1,
            )
        )
    return rows, reqs


def test_deep_chain_rerank_conformance(tmp_path):
    """Depth-8 crawl: without the dense re-rank the child_seq encoding
    overflows at depth 4; engine and oracle must re-rank identically."""
    from spiderman_ray.engine import CrawlEngine, read_table_all_gens
    from spiderman_ray.oracle import run_oracle
    from spiderman_ray.parsers import PARSERS

    params = SimParams(pages=1, details=2, images=1, hosts=2, img_hosts=1,
                       dup_link_rate=0.0, private_rate=0.0, fail_rate=0.0,
                       dead_rate=0.0)
    parsers = {**PARSERS, "list": deep_chain_parse}
    o = run_oracle(params, CrawlPolicy(), parsers=parsers)
    out = str(tmp_path / "deep")
    eng = CrawlEngine(params, CrawlPolicy(), out_dir=out, parsers=parsers)
    m = eng.run()
    assert m["generations"] >= 8
    assert m["crawled"] == o.metrics["crawled"]
    co = (
        read_table_all_gens(out, "crawl_order")
        .to_pandas()
        .sort_values(["generation", "seq"])
    )
    assert co["url"].tolist() == [c["url"] for c in o.crawl_order]
    eng._pool.shutdown()
