"""Deep pagination-chain crawl fixture — the reference's mid-crawl
next-page push made first-class.

The reference pushes the NEXT list page back onto the shared FIFO while the
crawl is running (``SP/spiders/zhifang.py:96`` ``reqs_push`` of page n+1
from the parse of page n), so its crawl graph is a deep chain of small
generations — the exact shape where a per-generation BFS barrier costs the
most wall-time. This module builds that shape from the PUBLIC extension
surface (spec.CrawlSpec + a custom parser), with one design constraint:

The chain spine stays at seq 0: the seed is page 1 with seq 0 and the
next-page child occupies slot 0 (``child_seq(0, 0) == 0``), so seqs never
grow with depth and the RERANK_THRESHOLD re-rank (parsers.py:37) is never
triggered — both the BFS engine and the pipelined mode crawl the chain
with identical, stable seqs at any depth. Detail children start at slot 1.

Used by tests/test_engine.py (BFS ≡ pipelined equality on a deep graph)
and by ``bench.py --deep`` (the BASELINE.md barrier-cost measurement).
"""

from __future__ import annotations

from spiderman_ray.functions.hashing import md5_upper
from spiderman_ray.parsers import PARSERS, child_seq, make_request
from spiderman_ray.simweb import SimParams, SimResponse, SimWeb
from spiderman_ray.spec import CrawlSpec


class ChainedListParser:
    """'list' parser with pagination: page p emits its detail children AND
    the next list page as child slot 0 — generation g holds exactly one
    list page, so crawl depth == page count."""

    def __init__(self, params: SimParams):
        self.params = params
        self._web = None  # lazy: SimWeb is O(1) but keep pickles tiny

    @property
    def web(self) -> SimWeb:
        if self._web is None:
            self._web = SimWeb(self.params)
        return self._web

    def __call__(self, resp: SimResponse, req: dict) -> tuple[list, list]:
        gen, seq, pagenum = req["generation"], req["seq"], req["pagenum"]
        rows, reqs = [], []
        if pagenum < self.params.pages:
            reqs.append(
                make_request(
                    self.web.list_url(pagenum + 1), "list",
                    generation=gen + 1, seq=child_seq(seq, 0),
                    pagenum=pagenum + 1,
                )
            )
        for i, (durl, rf) in enumerate(zip(resp.links, resp.rows), start=1):
            pkey = md5_upper(durl)
            rows.append(
                {
                    "title": rf["title"],
                    "desc": rf["desc"],
                    "location": rf["location"],
                    "price": rf["price"],
                    "detail_full_url": durl,
                    "pkey": pkey,
                    "pagenum": pagenum,
                    "generation": gen,
                    "seq": child_seq(seq, i),
                }
            )
            reqs.append(
                make_request(
                    durl, "detail", generation=gen + 1, seq=child_seq(seq, i),
                    fkey=pkey, pagenum=pagenum,
                )
            )
        return rows, reqs


def chain_seeds(web: SimWeb) -> list[dict]:
    """ONE seed — page 1, seq 0 (the chain spine anchor)."""
    return [make_request(web.list_url(1), "list", generation=0, seq=0, pagenum=1)]


def deep_spec(pages: int = 40, **overrides) -> CrawlSpec:
    """CrawlSpec for a depth-``pages`` chain crawl. Pass dup_link_rate=0.0,
    dup_image_rate=0.0 for the bit-identical BFS ≡ pipelined contract."""
    params = SimParams(
        **{
            "pages": pages, "details": 6, "images": 3,
            "hosts": 6, "img_hosts": 3,
            **overrides,
        }
    )
    parsers = dict(PARSERS)
    parsers["list"] = ChainedListParser(params)
    from spiderman_ray.policy import CrawlPolicy

    # depth = pages (list chain) + 2 (details, images) generations
    policy = CrawlPolicy(max_generations=pages + 3)
    return CrawlSpec(name="deepchain", params=params, policy=policy,
                     parsers=parsers, seed_fn=chain_seeds)
