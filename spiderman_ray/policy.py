"""CrawlSpec / CrawlPolicy — the user-extension surface (SURVEY.md §2.9).

One engine, many specs: replaces the reference's generated
``{name}_job.py / {name}.py / {name}_items.py`` triple (easy_scrapy.py) with a
single dataclass. The policy knobs mirror the reference settings:

- ``retry_times``           SP/settings.py:122  (RETRY_TIMES = 3)
- ``min_size``              SPMiddleWare.py:136-157 (SizeRetryMiddleWare)
- ``dedup`` per callback    get_callback's dont_filter flag
                            (SP/spiders/SPRedisSpider.py:35, zhifang.py:55-61)
- ``bloom*``                SP/bloom_dupefilter.py + README.md:166-189
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlPolicy:
    retry_times: int = 3  # extra attempts after the first (scrapy RETRY_TIMES)
    min_size: int | None = None  # MINSIZE; None = middleware off (reference default)
    dedup: bool = True  # global default (README's recommended config)
    dedup_overrides: dict[str, bool] = field(default_factory=dict)  # per callback
    dedup_mode: str = "exact"  # 'exact' | 'bloom' | 'cuckoo' (north rule)
    bloom_mem_mb: int = 16
    bloom_k: int = 7
    num_shards: int = 4  # seen-set shards (engine actors == oracle sub-filters)
    max_generations: int = 16
    clock: str = "virtual"  # 'virtual' | 'wall' politeness clock
    default_delay_ms: int = 0
    #: url_check blocklist applied to child requests before they enter the
    #: frontier (SP/utils/tool.py:116-134; spiders call it pre-push). None =
    #: off (zhifang does not enable it); blocked urls become dead letters
    #: with reason 'dirty_url' instead of silent drops.
    dirty_words: tuple | None = None
    #: scrapy-splash routing (SP/spiders/SPRedisSpider.py:47-54): requests
    #: whose callback is in ``callbacks`` go through the render fetch path;
    #: ``images: 0`` (the reference's default) suppresses image child
    #: requests of rendered pages. None = splash off.
    splash: dict | None = None  # {"callbacks": ("detail",), "wait": 2, "images": 0|1}
    #: AutoThrottle analog (scrapy's extension, shipped commented-out by the
    #: reference — SP/settings.py:178-187; opt-in here the same way):
    #: per-host delay adapts to observed latency via
    #: state/politeness.throttle_step. Virtual-clock BFS mode only (the
    #: adaptive ledger state lives in a ThrottleClock actor across
    #: generations). None = off.
    #: {"start_delay_ms": 100, "max_delay_ms": 5000, "min_delay_ms": 0,
    #:  "target_concurrency": 1.0}
    autothrottle: dict | None = None

    @property
    def max_attempts(self) -> int:
        return self.retry_times + 1

    def dedup_for(self, callback: str) -> bool:
        return self.dedup_overrides.get(callback, self.dedup)

    def render_for(self, callback: str) -> bool:
        return bool(self.splash) and callback in self.splash.get("callbacks", ())

    @property
    def splash_suppress_images(self) -> bool:
        return bool(self.splash) and not self.splash.get("images", 0)


def load_policy(out_dir: str) -> CrawlPolicy | None:
    """Load the CrawlPolicy persisted beside a crawl checkpoint
    (engine._write_policy). Returns None when the run predates the file.
    JSON round-trip restores the tuple-typed fields."""
    import json
    import os

    path = os.path.join(out_dir, "policy.json")
    if not os.path.isfile(path):
        return None
    d = json.load(open(path))
    if d.get("dirty_words") is not None:
        d["dirty_words"] = tuple(d["dirty_words"])
    if d.get("splash") and d["splash"].get("callbacks"):
        d["splash"]["callbacks"] = tuple(d["splash"]["callbacks"])
    return CrawlPolicy(**d)
