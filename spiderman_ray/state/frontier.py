"""Sharded frontier buffer actors for the pipelined crawl mode.

The reference holds its frontier in a shared Redis list
(``SP/utils/ctrl_redis.py:21-75``) — an external store, so no crawler
process ever owns the whole frontier. The Ray-native analog is a pool of
``FrontierShard`` actors (host-hashed): pipelined waves PUSH their child
requests straight into the shards (idempotent per-wave tokens, so a Ray
task retry can't double-enqueue), and the driver scheduler POPS wave
slices by reference — ``pop_wave`` returns the row table as its own
object-store return value, which the driver hands to the next wave task
WITHOUT ever materializing it. The driver's footprint is O(hosts x
active generations) integer counters; no frontier row, child URL or
payload ever transits the driver heap.

At test scale one shard suffices; ``shard_of`` hash-routes hosts so a
256-node cluster spreads the frontier across the pool exactly like the
seen-set shards (state/seen.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from spiderman_ray import schemas
from spiderman_ray.functions.hashing import hash64


@ray.remote(num_cpus=0)
class FrontierShard:
    """One frontier shard: (host, generation) -> buffered request tables.

    ``push`` is token-idempotent (a retried wave re-pushes with its
    deterministic token and is ignored); ``pop_wave`` is driver-
    coordinated, so it runs exactly once per wave construction."""

    def __init__(self):
        self._bufs: dict[tuple[str, int], list[pa.Table]] = {}
        self._tokens: set[str] = set()

    def push(self, token: str, tbl: pa.Table) -> list:
        """Idempotent append; returns [(host, gen, n_rows), ...] accepted
        (empty on a replayed token)."""
        if token in self._tokens or tbl.num_rows == 0:
            return []
        self._tokens.add(token)
        out = []
        gens = pc.unique(tbl["generation"]).to_pylist()
        for g in gens:
            sub = tbl.filter(pc.equal(tbl["generation"], g))
            for h in pc.unique(sub["host"]).to_pylist():
                part = sub.filter(pc.equal(sub["host"], h))
                self._bufs.setdefault((h, int(g)), []).append(part)
                out.append((h, int(g), part.num_rows))
        return out

    def pop_wave(self, host: str, gen: int, cap: int | None) -> tuple[pa.Table, dict]:
        """Pop up to ~``cap`` rows (whole buffered tables — parse-sized,
        so the cap is soft) of (host, gen). num_returns=2 callers take the
        TABLE by reference and materialize only the meta dict."""
        key = (host, int(gen))
        bufs = self._bufs.get(key, [])
        take, n = [], 0
        while bufs and (cap is None or n < cap):
            t = bufs.pop(0)
            take.append(t)
            n += t.num_rows
        if not bufs:
            self._bufs.pop(key, None)
        tbl = pa.concat_tables(take) if take else schemas.empty(schemas.FRONTIER)
        left = sum(t.num_rows for t in self._bufs.get(key, []))
        return tbl, {"n": tbl.num_rows, "left": left}

    def clear_tokens(self) -> int:
        n = len(self._tokens)
        self._tokens.clear()
        return n

    def counts(self) -> dict:
        """Debug/test view: (host, gen) -> buffered rows."""
        return {k: sum(t.num_rows for t in v) for k, v in self._bufs.items()}


def shard_of(host: str, num_shards: int) -> int:
    return int(hash64([host])[0] % num_shards)
