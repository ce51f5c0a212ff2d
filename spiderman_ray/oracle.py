"""Reference-oracle simulator: the single-process scrapy-redis loop, faithfully.

A pure-Python, single-threaded reimplementation of the reference crawl loop
(SURVEY.md §5.1) that defines the golden crawl order, URL-seen set and output
rows the Ray engine must reproduce:

- FIFO frontier: ``rpush`` at tail / ``lpop`` at head
  (SP/utils/ctrl_redis.py:30,69; README.md:103 calls it breadth-first)
- dedup at schedule time, first occurrence wins, per-callback opt-out
  (SP/spiders/SPRedisSpider.py:35; SP/settings.py:103); exact-set or
  sharded-bloom mode with the reference hash family
- robots + per-host crawl-delay (virtual clock) — north-rule additions,
  applied in the pinned order: dedup -> robots -> politeness -> fetch
- retry policy: RETRY_TIMES extra attempts on the retryable codes
  (SP/settings.py:122-124); exhausted error -> dead letter (scrapy HttpError
  drops non-2xx); MINSIZE exhaustion parses anyway
  (SizeRetryMiddleWare's ``self._retry(...) or response``,
  SP/middlewares/SPMiddleWare.py:145-153)
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urlsplit

import numpy as np

from spiderman_ray.functions.hashing import bloom_shards
from spiderman_ray.parsers import PARSERS, RERANK_THRESHOLD, make_image_row, make_request
from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams, SimWeb, fetch_outcome
from spiderman_ray.state.bloom import ExactSet, NumpyBloom
from spiderman_ray.state.politeness import HostLedger, RobotsCache


class ShardedSeenLocal:
    """In-process equivalent of the actor pool — same shard routing, same
    filters, so bloom false-positive behavior matches the engine exactly."""

    def __init__(self, policy: CrawlPolicy):
        from spiderman_ray.state.seen import make_filter

        n = policy.num_shards
        self.filters = [
            make_filter(policy.dedup_mode, policy.bloom_mem_mb, policy.bloom_k)
            for _ in range(n)
        ]
        self.n = n

    def offer_one(self, fp: str) -> bool:
        sid = int(bloom_shards([fp], self.n)[0])
        return bool(self.filters[sid].offer_batch([fp])[0])

    def fingerprints(self) -> set[str]:
        fps = set()
        for f in self.filters:
            if isinstance(f, ExactSet):
                fps |= f.fps
        return fps

    def bitmaps(self) -> list[np.ndarray]:
        return [f.bits for f in self.filters if isinstance(f, NumpyBloom)]


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)
    pages: list[dict] = field(default_factory=list)
    details: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    dead_letters: list[dict] = field(default_factory=list)
    seen_fps: set[str] = field(default_factory=set)
    seen_bitmaps: list[np.ndarray] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def seed_requests(web: SimWeb) -> list[dict]:
    """Seed generator — SPJob.make_job equivalent (SP_JOBS/zhifang_job.py:27-41):
    list pages 1..P in push order, seq = push index; optional POST-search
    seeds after them (FormRequest path — same URL, distinct bodies, so the
    fingerprint covers the body)."""
    seeds = [
        make_request(web.list_url(p), "list", generation=0, seq=p - 1, pagenum=p)
        for p in range(1, web.p.pages + 1)
    ]
    import json as _json

    for k in range(web.p.search_seeds):
        seeds.append(
            make_request(
                web.search_url(k % web.p.hosts), "search", generation=0,
                seq=web.p.pages + k, pagenum=0, method="POST",
                body=_json.dumps({"kw": k}),
            )
        )
    return seeds


# fetch_outcome lives in simweb.py and is shared with stages/fetch.py


def run_oracle(
    params: SimParams,
    policy: CrawlPolicy | None = None,
    delays_ms: dict[str, int] | None = None,
    parsers: dict | None = None,
) -> OracleResult:
    policy = policy or CrawlPolicy()
    web = SimWeb(params)
    pol_cfg = web.politeness_config(delays_ms)
    robots = RobotsCache({h: c["robots_disallow"] for h, c in pol_cfg.items()})
    if policy.autothrottle and policy.clock != "virtual":
        raise ValueError("autothrottle requires the virtual politeness clock")
    ledger = HostLedger(
        {h: c["crawl_delay_ms"] for h, c in pol_cfg.items()},
        default_delay_ms=policy.default_delay_ms,
        clock="virtual",
        autothrottle=policy.autothrottle,
    )
    parsers = parsers or PARSERS
    seen = ShardedSeenLocal(policy)
    res = OracleResult()
    # priority frontier: scrapy-redis pops the highest-priority request;
    # within one BFS wave that equals sorting the wave by (-priority, seq)
    # (children belong to the NEXT wave — list->detail->image is strictly
    # level-ordered). All-zero priorities reduce to the pure FIFO.
    seeds = seed_requests(web)
    if seeds and max(r["seq"] for r in seeds) >= RERANK_THRESHOLD:
        # same rule the engine applies to the gen-0 checkpoint
        for new_seq, r in enumerate(sorted(seeds, key=lambda r: r["seq"])):
            r["seq"] = new_seq
    frontier = deque(sorted(seeds, key=lambda r: (-r["priority"], r["seq"])))
    pending_next: list = []
    fetches = 0
    wave = 0

    while frontier or pending_next:
        if not frontier:
            wave += 1
            if wave >= policy.max_generations:
                break  # same cap the engine enforces (engine.py run loop)
            if pending_next and max(r["seq"] for r in pending_next) >= RERANK_THRESHOLD:
                # dense re-rank in seq order (same rule as the engine) so
                # deep graphs never overflow the child_seq encoding
                for new_seq, r in enumerate(sorted(pending_next, key=lambda r: r["seq"])):
                    r["seq"] = new_seq
            frontier = deque(
                sorted(pending_next, key=lambda r: (-r["priority"], r["seq"]))
            )
            pending_next = []
        req = frontier.popleft()
        if policy.dedup_for(req["callback"]) and not seen.offer_one(req["fp"]):
            continue  # duplicate — first-pushed occurrence already crawled
        host, path = req["host"], urlsplit(req["url"]).path
        if not robots.allowed(host, path):
            res.dead_letters.append(
                {
                    "url": req["url"],
                    "reason": "robots",
                    "status_code": 0,
                    "attempts": 0,
                    "generation": req["generation"],
                    "seq": req["seq"],
                    "host": host,
                    "fp": req["fp"],
                }
            )
            continue
        t = ledger.acquire(host)
        ok, attempts, status, size_exhausted = fetch_outcome(web, req["url"], policy)
        fetches += attempts  # dead letters consumed their attempts too
        if policy.autothrottle:
            # post-response delay adaptation — every ATTEMPTED fetch
            # observes (http errors too: they can only raise the delay)
            ledger.observe(host, web.latency_ms(req["url"]), ok)
        if not ok:
            res.dead_letters.append(
                {
                    "url": req["url"],
                    "reason": "http_error",
                    "status_code": status,
                    "attempts": attempts,
                    "generation": req["generation"],
                    "seq": req["seq"],
                    "host": host,
                    "fp": req["fp"],
                }
            )
            continue
        res.crawl_order.append(
            {
                "url": req["url"],
                "generation": req["generation"],
                "host": host,
                "seq": req["seq"],
                "attempts": attempts,
                "vts_ms": t,
                "ua_idx": web.ua_index(req["url"], attempts),
                "cookie_idx": web.cookie_index(req["url"], attempts),
                "proxy_idx": web.proxy_index(req["url"], attempts),
                "fp": req["fp"],
            }
        )
        if req["callback"] == "image":
            res.images.append(make_image_row(req, web.fetch(req["url"]).body))
        else:
            resp = web.fetch(
                req["url"], req.get("body") or "",
                render=policy.render_for(req["callback"]),
            )
            rows, children = parsers[req["callback"]](resp, req)
            if policy.splash_suppress_images and policy.render_for(req["callback"]):
                children = [r for r in children if r["callback"] != "image"]
            if req["callback"] in ("list", "search"):
                res.pages.extend(rows)
            else:
                res.details.extend(rows)
            if policy.dirty_words:
                from spiderman_ray.functions.urls import DIRTY_WORDS

                block = tuple(DIRTY_WORDS) + tuple(policy.dirty_words)
                kept = []
                for r in children:
                    if not any(w in r["url"] for w in block):
                        kept.append(r)
                    else:
                        res.dead_letters.append(
                            {
                                "url": r["url"], "reason": "dirty_url",
                                "status_code": 0, "attempts": 0,
                                "generation": r["generation"], "seq": r["seq"],
                                "host": r["host"], "fp": r["fp"],
                            }
                        )
                children = kept
            pending_next.extend(children)  # next wave (priority-sorted later)

    res.seen_fps = seen.fingerprints()
    res.seen_bitmaps = seen.bitmaps()
    res.metrics = {
        "seen_count": sum(
            len(f.fps) if isinstance(f, ExactSet)
            else f.n_added - getattr(f, "n_deleted", 0)
            for f in seen.filters
        ),
        "crawled": len(res.crawl_order),
        "pages": len(res.pages),
        "details": len(res.details),
        "images": len(res.images),
        "dead": len(res.dead_letters),
        "attempts_total": fetches,
        "robots_fetches": robots.fetch_count,
        "host_vclock_ms": dict(ledger.vnow_ms),
    }
    return res
