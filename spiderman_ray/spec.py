"""CrawlSpec — the user-extension surface: one engine, many crawls.

Replaces the reference's per-site generated triple ``{name}_job.py`` /
``{name}.py`` / ``{name}_items.py`` (easy_scrapy.py code-gen,
README.md:201-213) and the per-spider ``custom_settings`` toggles
(SP/spiders/zhifang.py:19-53) with one declarative dataclass:

- ``seed_fn``      = the job's make_job (SP_JOBS/zhifang_job.py:27-41)
- ``parsers``      = the callback registry get_callback (zhifang.py:55-61);
                     values are ``fn(SimResponse, request_row) -> (rows,
                     child_requests)`` — module-level functions so they
                     pickle into Ray tasks
- ``policy``       = dedup/retry/politeness knobs (CrawlPolicy)
- ``headers`` / ``cookies`` = the HeadersMiddleWare / CookiesPoolMiddleWare
                     pools (SP/middlewares/SPMiddleWare.py:49-63,88-103);
                     carried as fetch config (the simulated web ignores
                     them, a live fetcher applies them per request with the
                     deterministic pick f(url, attempt))

``tests/test_spec.py`` proves the surface: a custom parser changes output
rows without touching engine code.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from spiderman_ray.parsers import PARSERS
from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams, SimWeb


def default_seeds(web: SimWeb) -> list[dict]:
    from spiderman_ray.oracle import seed_requests

    return seed_requests(web)


@dataclass
class CrawlSpec:
    name: str = "zhifang_sim"
    params: SimParams = field(default_factory=SimParams)
    policy: CrawlPolicy = field(default_factory=CrawlPolicy)
    parsers: dict[str, Callable] = field(default_factory=lambda: dict(PARSERS))
    seed_fn: Callable[[SimWeb], list[dict]] = default_seeds
    delays_ms: dict[str, int] | None = None
    headers: dict[str, str] = field(default_factory=dict)
    cookies: list[str] = field(default_factory=list)


def build_engine(spec: CrawlSpec, out_dir: str, **engine_kwargs):
    from spiderman_ray.engine import CrawlEngine

    return CrawlEngine(
        spec.params,
        spec.policy,
        out_dir=out_dir,
        delays_ms=spec.delays_ms,
        parsers=spec.parsers,
        seed_fn=spec.seed_fn,
        **engine_kwargs,
    )
