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


def throttle_cfg(at: dict | None) -> tuple[float, float, float, float]:
    """Normalize an ``autothrottle`` policy dict to (start_delay_ms,
    min_delay_ms, max_delay_ms, target_concurrency) with the
    scrapy-documented defaults (SP/settings.py:178-187 ships the extension
    commented out; the analog here is opt-in the same way)."""
    at = at or {}
    return (
        float(at.get("start_delay_ms", 100.0)),
        float(at.get("min_delay_ms", 0.0)),
        float(at.get("max_delay_ms", 5000.0)),
        float(at.get("target_concurrency", 1.0)),
    )


def throttle_step(
    cur_delay_ms: float,
    latency_ms: float,
    ok: bool,
    target_concurrency: float,
    min_delay_ms: float,
    max_delay_ms: float,
) -> float:
    """One AutoThrottle update — the public scrapy algorithm: the next
    delay is the average of the current delay and latency/target_
    concurrency; non-OK responses never DECREASE the delay; clamped to
    [min, max]. THE single arithmetic, shared by the engine fetch stage
    and the oracle ledger (parity by construction, like fetch_outcome)."""
    target = latency_ms / target_concurrency
    new = (cur_delay_ms + target) / 2.0
    if not ok and new < cur_delay_ms:
        new = cur_delay_ms
    return min(max(new, min_delay_ms), max_delay_ms)


@ray.remote(num_cpus=0)
class ThrottleClock:
    """Per-host adaptive-delay ledger state carried ACROSS generations in
    BFS mode (one fetch group per host per generation, serialized by the
    barrier, so get/set per group is race-free). State is crawl-lifetime:
    a resume restarts delays at start_delay — the same conservative reset
    a scrapy process restart performs.

    ``token`` (the fetch group's deterministic retry token) makes the
    read idempotent under Ray task retry: a replayed group re-reads the
    SAME pre-group state it saw the first time (even if its first attempt
    already committed), recomputes the identical vts sequence, and its
    commit rewrites the same values. Tokens are cleared at each
    generation barrier (engine.run), bounding the cache."""

    def __init__(self):
        self._state: dict[str, tuple[float, float]] = {}
        self._reads: dict[tuple[str, str], tuple[float, float]] = {}

    def get(self, host: str, start_delay_ms: float,
            token: str | None = None) -> tuple[float, float]:
        if token is not None:
            key = (host, token)
            if key not in self._reads:
                self._reads[key] = self._state.get(host, (0.0, float(start_delay_ms)))
            return self._reads[key]
        return self._state.get(host, (0.0, float(start_delay_ms)))

    def set(self, host: str, vnow_ms: float, delay_ms: float) -> None:
        self._state[host] = (float(vnow_ms), float(delay_ms))

    def clear_tokens(self) -> int:
        n = len(self._reads)
        self._reads.clear()
        return n

    def totals(self) -> dict:
        return dict(self._state)


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
                 clock: str = "virtual", autothrottle: dict | None = None):
        self.delays_ms = delays_ms
        self.default_delay_ms = default_delay_ms
        self.clock = clock
        self.next_ok_ms: dict[str, float] = {}
        self.vnow_ms: dict[str, float] = {}
        # autothrottle (virtual clock only): per-host adaptive delay; the
        # clock advances in observe() (post-response), not acquire()
        self.autothrottle = autothrottle
        self.at_delay_ms: dict[str, float] = {}

    def delay_for(self, host: str) -> int:
        return int(self.delays_ms.get(host, self.default_delay_ms))

    def acquire(self, host: str) -> float:
        """Block (wall) or account (virtual) one fetch slot; returns the
        fetch timestamp in ms (virtual ms from 0, or epoch wall ms)."""
        if self.autothrottle:
            return self.vnow_ms.get(host, 0.0)  # advance happens in observe
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

    def observe(self, host: str, latency_ms: float, ok: bool) -> float:
        """AutoThrottle post-response update: adapt the host's delay from
        the observed latency and advance its virtual clock by the NEW delay
        (the gap to the next request, scrapy semantics)."""
        start, mn, mx, tc = self._at_cfg
        cur = self.at_delay_ms.get(host, start)
        new = throttle_step(cur, latency_ms, ok, tc, mn, mx)
        self.at_delay_ms[host] = new
        self.vnow_ms[host] = self.vnow_ms.get(host, 0.0) + new
        return new

    @property
    def _at_cfg(self) -> tuple[float, float, float, float]:
        return throttle_cfg(self.autothrottle)


@ray.remote(num_cpus=0)
class HostClock:
    """Atomic per-host slot reservation for salted (split) hot hosts: every
    salted partition reserves its own contiguous virtual-slot range, so the
    union respects the per-host budget exactly.

    ``token`` (the fetch group's deterministic retry token) makes the
    reservation idempotent under Ray task retry: a replayed group gets its
    PRIOR range back instead of burning a second one (which would shift
    every later vts on that host). Grants are cleared at each generation
    barrier, bounding the map."""

    def __init__(self):
        self._slots: dict[str, int] = {}
        self._grants: dict[tuple[str, str], int] = {}

    def init(self, base: dict[str, int]) -> None:
        """Seed per-host slot counters (resume continuity)."""
        for h, n in base.items():
            self._slots[h] = max(self._slots.get(h, 0), int(n))

    def reserve(self, host: str, n: int, token: str | None = None) -> int:
        if token is not None:
            key = (host, token)
            if key in self._grants:
                return self._grants[key]
        start = self._slots.get(host, 0)
        self._slots[host] = start + n
        if token is not None:
            self._grants[(host, token)] = start
        return start

    def clear_tokens(self) -> int:
        n = len(self._grants)
        self._grants.clear()
        return n

    def totals(self) -> dict[str, int]:
        return dict(self._slots)
