"""Fetch stage: politeness-aware, host-partitioned simulated HTTP.

The scrapy downloader + middleware chain (SP/settings.py:116-187,
SP/middlewares/SPMiddleWare.py) becomes a host-partitioned Ray Data stage:
the frontier is grouped by ``fetch_key`` (canonical host, or ``host#i``
salted sub-keys for hot hosts) and each group is fetched by one worker, which
makes per-host politeness enforceable locally:

- robots rules per host, applied to the URL path (north-rule addition; the
  reference ships ROBOTSTXT_OBEY=False, SP/settings.py:119)
- crawl-delay budget via HostLedger — virtual clock (deterministic
  accounting) or wall clock (real sleeps); when a host is salted, slot
  ranges come from the shared HostClock actor so the union of salted
  groups still respects the budget
- deterministic retries: RETRY_TIMES extra attempts on the retryable codes
  (SP/settings.py:122-124), min-size retry then parse-anyway
  (SPMiddleWare.py:145-153), UA pick = f(url, attempt) replacing the
  random UA middleware (SPMiddleWare.py:18-46)

On the real web this stage would be ``map_batches(Fetcher, concurrency=(a,b))``
with connection pools in actor state; against the simulated web the group fn
is a cheap callable (SimWeb construction is O(1)) and the group boundary IS
the politeness boundary.

Output: the "wire" union table — one row per frontier row, kind='fetched'
(payload columns set) or 'dead' (reason/status set), plus one 'hostmeta'
metric row per (group, host) carrying fetch counts and the end-of-generation
virtual clock for cross-generation politeness continuity.
"""

from __future__ import annotations

import json
import time
from urllib.parse import urlsplit

import pandas as pd
import pyarrow as pa
import ray

from spiderman_ray.policy import CrawlPolicy
from spiderman_ray.simweb import SimParams, SimWeb, fetch_outcome

WIRE_FIELDS = [
    ("url", pa.string()),
    ("callback", pa.string()),
    ("fkey", pa.string()),
    ("pagenum", pa.int32()),
    ("px", pa.int32()),
    ("caption", pa.string()),
    ("priority", pa.int32()),
    ("generation", pa.int32()),
    ("seq", pa.int64()),
    ("host", pa.string()),
    ("fp", pa.string()),
    ("kind", pa.string()),  # 'fetched' | 'dead' | 'hostmeta'
    ("status_code", pa.int32()),
    ("attempts", pa.int32()),
    ("vts_ms", pa.float64()),
    ("reason", pa.string()),
    ("links", pa.list_(pa.string())),
    ("rows_json", pa.string()),
    ("fields_json", pa.string()),
    ("image_urls", pa.list_(pa.string())),
    ("captions", pa.list_(pa.string())),
    ("body", pa.binary()),
    ("n_meta", pa.int64()),  # hostmeta: fetches in this group
    ("ua_idx", pa.int32()),  # deterministic UA pick f(url, final attempt)
    ("cookie_idx", pa.int32()),  # deterministic CookiesPool pick (same contract)
    ("proxy_idx", pa.int32()),  # deterministic rotating-proxy pick (same contract)
]
WIRE_SCHEMA = pa.schema(WIRE_FIELDS)


def _wire_row(req: dict | None = None, **over) -> dict:
    row = {name: None for name, _ in WIRE_FIELDS}
    row.update(
        {
            "status_code": 0,
            "attempts": 0,
            "vts_ms": 0.0,
            "reason": "",
            "links": [],
            "rows_json": "",
            "fields_json": "",
            "image_urls": [],
            "captions": [],
            "body": b"",
            "n_meta": 0,
            "ua_idx": 0,
            "cookie_idx": 0,
            "proxy_idx": 0,
        }
    )
    if req is not None:
        for k in ("url", "callback", "fkey", "pagenum", "px", "caption",
                  "priority", "generation", "seq", "host", "fp"):
            row[k] = req[k]
    else:
        row.update({"url": "", "callback": "", "fkey": "", "pagenum": 0, "px": 0,
                    "caption": "", "priority": 0, "generation": 0, "seq": 0,
                    "host": "", "fp": ""})
    row.update(over)
    return row


class FetchGroup:
    """map_groups fn over one fetch_key group. Deterministic."""

    def __init__(
        self,
        params: SimParams,
        policy: CrawlPolicy,
        pol_cfg: dict,
        base_slots: dict[str, int] | None = None,
        host_clock: "ray.actor.ActorHandle | None" = None,
        seen_pool=None,
        throttle_clock: "ray.actor.ActorHandle | None" = None,
    ):
        self.params = params
        self.policy = policy
        self.pol_cfg = pol_cfg
        self.base_slots = base_slots or {}
        self.host_clock = host_clock
        # AutoThrottle ledger state (vnow, cur_delay) per host, carried
        # across generations by the ThrottleClock actor (BFS serializes one
        # group per host per generation, so get/set is race-free)
        self.throttle_clock = throttle_clock
        # Dedup is FUSED into this stage: a URL's fingerprint determines its
        # host (fp = md5(canonical url)), so the politeness partition already
        # co-locates every duplicate of a fingerprint — one shuffle serves
        # both dedup and politeness. Salting keeps this (salt = hash64(fp),
        # same fp -> same sub-group even across url spellings). ``seen_pool``
        # is the cross-generation
        # sharded seen-set handle (actor handles serialize into tasks).
        self.seen_pool = seen_pool
        self._web = None  # constructed lazily per worker

    @property
    def web(self) -> SimWeb:
        if self._web is None:
            self._web = SimWeb(self.params)
        return self._web

    def _delay(self, host: str) -> int:
        cfg = self.pol_cfg.get(host)
        return int(cfg["crawl_delay_ms"]) if cfg else self.policy.default_delay_ms

    def _disallowed(self, host: str, path: str) -> bool:
        cfg = self.pol_cfg.get(host)
        return bool(cfg) and any(path.startswith(p) for p in cfg["robots_disallow"])

    def __call__(self, group: pd.DataFrame) -> pa.Table:
        # per-host order: priority first (scrapy-redis priority-queue
        # semantics, higher pops first), FIFO seq as the tiebreak — with all
        # priorities 0 this IS the reference FIFO
        group = group.sort_values(["priority", "seq"], ascending=[False, True])
        # deterministic retry token of this fetch group: the SAME token on a
        # Ray task replay makes every stateful side effect idempotent (seen
        # offers, HostClock slot ranges, ThrottleClock reads)
        token = (
            f"g{int(group['generation'].iloc[0])}|{group['fetch_key'].iloc[0]}"
            if "fetch_key" in group
            else f"g{int(group['generation'].iloc[0])}|{group['host'].iloc[0]}"
        )
        if self.seen_pool is not None:
            # first-wins dedup (intra-generation by seq order, then the
            # cross-generation seen actors), per-callback opt-out like the
            # reference's dont_filter (SP/spiders/zhifang.py:55-61)
            dmask = group["callback"].map(self.policy.dedup_for).to_numpy(dtype=bool)
            sub = group[dmask]
            if len(sub):
                sub = sub.drop_duplicates("fp", keep="first")  # priority/seq-sorted
                # same token on replay -> prior accepts back instead of False
                accepted = self.seen_pool.offer(
                    sub["fp"].to_numpy(dtype=object), token=token
                )
                sub = sub[accepted]
                group = (
                    pd.concat([sub, group[~dmask]]).sort_values(
                        ["priority", "seq"], ascending=[False, True]
                    )
                    if (~dmask).any()
                    else sub
                )
            if group.empty:
                return pa.Table.from_pylist([], schema=WIRE_SCHEMA)
        host = str(group["host"].iloc[0])
        delay = self._delay(host)
        records = group.to_dict("records")
        allowed = [not self._disallowed(host, urlsplit(r["url"]).path) for r in records]
        n_attempted = sum(allowed)
        # politeness slot base: salted groups reserve atomically via HostClock
        # (token-idempotent: a replayed task gets its prior range back)
        if self.host_clock is not None:
            slot0 = ray.get(self.host_clock.reserve.remote(host, n_attempted, token))
        else:
            slot0 = self.base_slots.get(host, 0)
        # AutoThrottle: restore the host's adaptive ledger (vnow, delay)
        throttle = self.policy.autothrottle
        if throttle:
            from spiderman_ray.state.politeness import throttle_cfg, throttle_step

            at_start, at_min, at_max, at_tc = throttle_cfg(throttle)
            if self.throttle_clock is not None:
                # token-idempotent read: a replayed group re-reads its
                # pre-group state and recomputes the identical vts sequence
                vnow, cur_delay = ray.get(
                    self.throttle_clock.get.remote(host, at_start, token)
                )
            else:
                vnow, cur_delay = 0.0, at_start
        out: list[dict] = []
        slot = slot0
        wall_next = 0.0
        web, policy = self.web, self.policy
        for req, ok in zip(records, allowed):
            url = req["url"]
            if not ok:
                out.append(_wire_row(req, kind="dead", reason="robots"))
                continue
            # politeness: account (virtual) or enforce (wall) the budget
            if policy.clock == "wall" and delay > 0:
                now = time.monotonic() * 1000.0
                if now < wall_next:
                    time.sleep((wall_next - now) / 1000.0)
                wall_next = max(now, wall_next) + delay
            # every attempted fetch consumes one politeness slot (the oracle
            # acquires BEFORE the outcome, so http-error requests count too;
            # robots-denied ones never reach the ledger)
            vts = vnow if throttle else float(slot * delay)
            slot += 1
            # deterministic fetch outcome — the SAME function the oracle
            # runs (engine/oracle parity by construction, like parsers)
            ok_f, attempts, status, _size_exhausted = fetch_outcome(web, url, policy)
            if throttle:
                # post-response adaptation, identical to the oracle ledger:
                # every attempted fetch observes (errors only raise it)
                cur_delay = throttle_step(
                    cur_delay, web.latency_ms(url), ok_f, at_tc, at_min, at_max
                )
                vnow += cur_delay
            if not ok_f:
                out.append(
                    _wire_row(
                        req, kind="dead", reason="http_error",
                        status_code=status, attempts=attempts,
                    )
                )
                continue
            resp = web.fetch(
                url, req.get("body") or "",
                render=self.policy.render_for(req["callback"]),
            )
            out.append(
                _wire_row(
                    req, kind="fetched", status_code=200, attempts=attempts,
                    vts_ms=vts, ua_idx=web.ua_index(url, attempts),
                    cookie_idx=web.cookie_index(url, attempts),
                    proxy_idx=web.proxy_index(url, attempts),
                    links=resp.links,
                    rows_json=json.dumps(resp.rows) if resp.rows else "",
                    fields_json=json.dumps(resp.fields) if resp.fields else "",
                    image_urls=resp.image_urls,
                    captions=resp.captions,
                    body=resp.body,
                )
            )
        if throttle and self.throttle_clock is not None:
            # persist BEFORE emitting rows: the barrier guarantees the next
            # generation's group for this host reads the updated state
            ray.get(self.throttle_clock.set.remote(host, vnow, cur_delay))
        fetch_key = str(group["fetch_key"].iloc[0]) if "fetch_key" in group else host
        out.append(
            _wire_row(None, kind="hostmeta", host=host, n_meta=slot - slot0,
                      vts_ms=(vnow if throttle else float(slot * delay)),
                      url=fetch_key,
                      generation=int(group["generation"].iloc[0]))
        )
        return pa.Table.from_pylist(out, schema=WIRE_SCHEMA)
