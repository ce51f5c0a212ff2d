"""Per-host politeness: crawl-delay budgets, robots rules, host clocks.

The reference ships politeness knobs but leaves them off: ``DOWNLOAD_DELAY``
(SP/settings.py:132), ``CONCURRENT_REQUESTS_PER_DOMAIN`` (SP/settings.py:134)
and ``ROBOTSTXT_OBEY=False`` (SP/settings.py:119). The north rule requires
robots + per-domain crawl-delay budgets, so they are first-class here.

Two clock modes:
- ``virtual``: deterministic accounting — each fetch advances the host's
  virtual clock by its crawl delay; no wall sleeping. Used by conformance
  tests and the oracle (identical arithmetic).
- ``wall``: actually rate-limits with time.sleep between same-host fetches.

``HostClock`` is a small Ray actor used when a hot host is salted across
fetch tasks: it hands out contiguous slot ranges atomically so the per-host
budget holds even with parallel salted partitions (SURVEY.md §7.3 skew note).
"""

from __future__ import annotations

import time

import ray


class RobotsCache:
    """Per-host robots rules, 'fetched' once per host and cached — mirrors a
    robots.txt cache; rules come from the politeness config table
    (simulated web has no live robots endpoint)."""

    def __init__(self, rules: dict[str, list[str]]):
        self._rules = rules
        self._cache: dict[str, list[str]] = {}
        self.fetch_count = 0  # metric: one simulated robots fetch per host

    def allowed(self, host: str, path: str) -> bool:
        if host not in self._cache:
            self._cache[host] = self._rules.get(host, [])
            self.fetch_count += 1
        return not any(path.startswith(p) for p in self._cache[host])


class HostLedger:
    """Per-host crawl-delay accounting inside ONE fetch worker (the frontier
    is host-partitioned, so one worker owns a host's rows for a generation)."""

    def __init__(self, delays_ms: dict[str, int], default_delay_ms: int = 0,
                 clock: str = "virtual"):
        self.delays_ms = delays_ms
        self.default_delay_ms = default_delay_ms
        self.clock = clock
        self.next_ok_ms: dict[str, float] = {}
        self.vnow_ms: dict[str, float] = {}

    def delay_for(self, host: str) -> int:
        return int(self.delays_ms.get(host, self.default_delay_ms))

    def acquire(self, host: str) -> float:
        """Block (wall) or account (virtual) one fetch slot; returns the
        fetch timestamp in ms (virtual ms from 0, or epoch wall ms)."""
        delay = self.delay_for(host)
        if self.clock == "virtual":
            t = self.vnow_ms.get(host, 0.0)
            self.vnow_ms[host] = t + delay
            return t
        now = time.monotonic() * 1000.0
        t = max(now, self.next_ok_ms.get(host, 0.0))
        if t > now:
            time.sleep((t - now) / 1000.0)
        self.next_ok_ms[host] = t + delay
        return t


@ray.remote(num_cpus=0)
class HostClock:
    """Atomic per-host slot reservation for salted (split) hot hosts: every
    salted partition reserves its own contiguous virtual-slot range, so the
    union respects the per-host budget exactly."""

    def __init__(self):
        self._slots: dict[str, int] = {}

    def init(self, base: dict[str, int]) -> None:
        """Seed per-host slot counters (resume continuity)."""
        for h, n in base.items():
            self._slots[h] = max(self._slots.get(h, 0), int(n))

    def reserve(self, host: str, n: int) -> int:
        start = self._slots.get(host, 0)
        self._slots[host] = start + n
        return start

    def totals(self) -> dict[str, int]:
        return dict(self._slots)
