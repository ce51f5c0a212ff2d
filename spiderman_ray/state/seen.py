"""Sharded URL-seen-set actor pool — the scrapy-redis dupefilter replacement.

The reference shares one Redis SET (exact, SP/settings.py:103) or sharded
bloom bitmaps (SP/bloom_dupefilter.py:33) across all spider processes. Here
each shard is a Ray actor owning one bitmap/set; a fingerprint is routed to
shard ``int(md5(fp)[0:2], 16) % num_shards`` — the reference's own shard
function (SP/bloom_dupefilter.py:33) — so bloom-mode bit layouts are
comparable shard-for-shard.

Scale notes (10^10 URLs): 128+ shards x 1-2 GiB bloom bitmaps spread across
the cluster; each dedup batch makes ONE ``offer`` RPC per shard (fingerprints
grouped driver-less, inside the map task), so chatter is O(shards) per batch,
not O(rows). Checkpoint = per-shard npz snapshot, restored on resume.

Bloom-mode conformance is PROBABILISTIC, not exact: the engine offers per
fetch group in nondeterministic order while the oracle offers in global FIFO
order, so on a bloom FALSE POSITIVE the two sides can reject different URLs
(and their subtrees then diverge). The final bitmaps still match bit-for-bit
whenever no false positive fired during the run — P(any fp) <=
n_offers * (1 - e^(-k*n/m))^k, which at the test sizes (n < 10^5 against
16 MiB x k=7 filters) is < 10^-9, so the bloom conformance tests are stable;
at 10^10-URL load the guarantee intentionally degrades to "reference-shaped
false-positive behavior", exactly like the reference's own sharded bloom
(SP/bloom_dupefilter.py:13-30). Exact mode has no such caveat.
"""

from __future__ import annotations

import os

import numpy as np
import ray

from spiderman_ray.functions.hashing import bloom_shards
from spiderman_ray.state.bloom import ExactSet, NumpyBloom
from spiderman_ray.state.cuckoo import CuckooFilter


def make_filter(mode: str, mem_mb: int = 16, bloom_k: int = 7):
    """Shared shard-filter factory: 'exact' | 'bloom' | 'cuckoo' (the north
    rule's seen-set modes). Used by both the engine actors and the oracle's
    in-process twin so the two always construct identical filters."""
    if mode == "bloom":
        return NumpyBloom(mem_mb, bloom_k)
    if mode == "cuckoo":
        return CuckooFilter(mem_mb)
    return ExactSet()


def restore_filter(st):
    mode = str(st["mode"])
    if mode == "bloom":
        return NumpyBloom.from_state(st)
    if mode == "cuckoo":
        return CuckooFilter.from_state(st)
    return ExactSet.from_state(st)


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One seen-set shard. num_cpus=0.25: shards are memory-bound lookups and
    must not starve fetch/parse stages of CPU slots."""

    def __init__(self, shard_id: int, mode: str = "exact", bloom_mem_mb: int = 16, bloom_k: int = 7):
        self.shard_id = shard_id
        self.mode = mode
        self.impl = make_filter(mode, bloom_mem_mb, bloom_k)
        # fp -> idempotency token of the offer that won it. Makes dedup safe
        # under Ray task retry: a replayed fetch group re-offers with its
        # deterministic token and gets its prior accepts back instead of
        # False (which would silently drop the whole group). Bounded by the
        # in-flight generation; the engine clears it at each barrier.
        self._tokens: dict[str, str] = {}

    def offer(self, fps: np.ndarray, token: str | None = None) -> np.ndarray:
        """Atomic check-then-add for a batch; True = first sight (accepted),
        or a replay of the accept that carries the same ``token``."""
        accepted = self.impl.offer_batch(fps)
        if token is not None:
            for i, fp in enumerate(fps):
                if accepted[i]:
                    self._tokens[fp] = token
                elif self._tokens.get(fp) == token:
                    accepted[i] = True  # same offerer replaying after a retry
        return accepted

    def clear_tokens(self) -> int:
        n = len(self._tokens)
        self._tokens.clear()
        return n

    def contains(self, fps: np.ndarray) -> np.ndarray:
        return self.impl.contains_batch(fps)

    def add(self, fps: np.ndarray) -> int:
        self.impl.add_batch(fps)
        return len(fps)

    def delete(self, fps: np.ndarray) -> np.ndarray:
        """Surgical un-see (exact + cuckoo modes; bloom cannot delete) —
        the patch-job re-offer path."""
        return self.impl.delete_batch(fps)

    def count(self) -> int:
        if self.mode == "bloom":
            return self.impl.n_added
        if self.mode == "cuckoo":
            return self.impl.n_added - self.impl.n_deleted
        return len(self.impl.fps)

    def dump(self):
        """Exact mode: sorted fps array; bloom/cuckoo: the bitmap/table."""
        return np.array(sorted(self.impl.fps), dtype=object) if self.mode == "exact" \
            else self.impl.bits

    def snapshot(self, path: str) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, **self.impl.state(), shard_id=self.shard_id)
        return path

    def restore(self, path: str) -> int:
        st = np.load(path, allow_pickle=True)
        self.impl = restore_filter(st)
        self.mode = str(st["mode"])
        return self.count()


class ShardedSeenSet:
    """Driver-side handle over the shard actors.

    ``route`` + per-shard ``offer`` can also run inside map_batches tasks —
    the handle is serializable (actor handles pickle fine).
    """

    def __init__(self, num_shards: int = 4, mode: str = "exact", bloom_mem_mb: int = 16,
                 bloom_k: int = 7):
        self.num_shards = num_shards
        self.mode = mode
        # Unnamed actors: each engine run owns a fresh pool (no stale state
        # leaking across runs in one Ray session); resume restores snapshots.
        self.shards = [
            SeenShard.remote(i, mode, bloom_mem_mb, bloom_k) for i in range(num_shards)
        ]

    def route(self, fps) -> np.ndarray:
        return bloom_shards(fps, self.num_shards)

    def offer(self, fps, token: str | None = None) -> np.ndarray:
        """Batch offer: group by shard, ONE rpc per shard, scatter back.
        ``token`` (deterministic per fetch group) makes replays idempotent."""
        fps = np.asarray(fps, dtype=object)
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        sid = self.route(fps)
        accepted = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            mask = sid == s
            if mask.any():
                refs.append(self.shards[s].offer.remote(fps[mask], token))
                idxs.append(np.nonzero(mask)[0])
        for ref, idx in zip(ray.get(refs), idxs):
            accepted[idx] = ref
        return accepted

    def clear_tokens(self) -> int:
        """Drop idempotency tokens (end of a generation barrier)."""
        return sum(ray.get([s.clear_tokens.remote() for s in self.shards]))

    def delete(self, fps) -> np.ndarray:
        """Un-see fingerprints (exact/cuckoo modes) — lets patch jobs
        re-offer residual URLs through the SAME pool."""
        fps = np.asarray(fps, dtype=object)
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        sid = self.route(fps)
        out = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            mask = sid == s
            if mask.any():
                refs.append(self.shards[s].delete.remote(fps[mask]))
                idxs.append(np.nonzero(mask)[0])
        for ref, idx in zip(ray.get(refs), idxs):
            out[idx] = ref
        return out

    def contains(self, fps) -> np.ndarray:
        fps = np.asarray(fps, dtype=object)
        if len(fps) == 0:
            return np.zeros(0, dtype=bool)
        sid = self.route(fps)
        out = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            mask = sid == s
            if mask.any():
                refs.append(self.shards[s].contains.remote(fps[mask]))
                idxs.append(np.nonzero(mask)[0])
        for ref, idx in zip(ray.get(refs), idxs):
            out[idx] = ref
        return out

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def snapshot(self, dir_path: str) -> list[str]:
        return ray.get(
            [
                s.snapshot.remote(os.path.join(dir_path, f"shard-{i}.npz"))
                for i, s in enumerate(self.shards)
            ]
        )

    def restore(self, dir_path: str) -> int:
        return sum(
            ray.get(
                [
                    s.restore.remote(os.path.join(dir_path, f"shard-{i}.npz"))
                    for i, s in enumerate(self.shards)
                ]
            )
        )

    def dump(self) -> list:
        """Per-shard state: fps arrays (exact) or bitmaps (bloom)."""
        return ray.get([s.dump.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
