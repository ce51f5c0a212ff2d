"""In-memory bloom filter + exact set with the reference's semantics.

The reference holds its bloom filter in Redis string bitmaps with
``setbit``/``getbit`` per seed (SP/bloom_dupefilter.py:32-44); ours is a numpy
uint8 bitmap per shard using the identical hash family
(``functions.hashing.bloom_positions``). The reference's check-then-add is
non-atomic across processes (SP/bloom_dupefilter.py:77-83); our per-shard
``offer`` is atomic per batch — strictly stronger while producing the same
positive/negative decisions for any sequential offer order.

Capacity guidance (README.md:166-189): 256 MiB, k=7 holds ~0.93e8 URLs at
~8.6e-5 false-positive; a 10^10-URL frontier therefore needs ~128 shards of
1-2 GiB each in bloom mode — which is exactly why the seen set is a sharded
actor pool, not a single process.
"""

from __future__ import annotations

import numpy as np

from spiderman_ray.functions.hashing import bloom_positions


class NumpyBloom:
    """One bloom shard. ``m = mem_mb * 8 * 1024 * 1024`` bits (power of two),
    bit-compatible with the reference for the same (mem, k)."""

    def __init__(self, mem_mb: int = 256, k: int = 7):
        self.mem_mb = mem_mb
        self.k = k
        self.m = mem_mb * 8 * 1024 * 1024
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        self.n_added = 0

    def _pos(self, values) -> tuple[np.ndarray, np.ndarray]:
        pos = bloom_positions(values, self.m, self.k)
        return (pos >> np.uint64(3)).astype(np.int64), (pos & np.uint64(7)).astype(np.uint8)

    def contains_batch(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        idx, bit = self._pos(values)
        return ((self.bits[idx] >> bit) & 1).all(axis=1)

    def add_batch(self, values) -> None:
        if len(values) == 0:
            return
        idx, bit = self._pos(values)
        np.bitwise_or.at(self.bits, idx.ravel(), np.uint8(1) << bit.ravel())
        self.n_added += len(values)

    def offer_batch(self, values) -> np.ndarray:
        """Atomic check-then-add with sequential semantics: result[i] is True
        iff values[i] was NOT present considering all earlier items of this
        batch. Intra-batch duplicates: only the first occurrence is True."""
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx, inverse = np.unique(values, return_index=True, return_inverse=True)
        fresh_uniq = ~self.contains_batch(uniq)
        accepted = fresh_uniq[inverse] & (np.arange(len(values)) == first_idx[inverse])
        if fresh_uniq.any():
            self.add_batch(uniq[fresh_uniq])
        return accepted

    # -- snapshot ----------------------------------------------------------
    def state(self) -> dict:
        return {
            "mode": "bloom",
            "mem_mb": self.mem_mb,
            "k": self.k,
            "bits": self.bits,
            "n_added": self.n_added,
        }

    @classmethod
    def from_state(cls, st: dict) -> "NumpyBloom":
        obj = cls(int(st["mem_mb"]), int(st["k"]))
        obj.bits = np.array(st["bits"], dtype=np.uint8, copy=True)
        obj.n_added = int(st["n_added"])
        return obj


class ExactSet:
    """Exact seen set (the Redis SET `{spider}:dupefilter` equivalent,
    SP/settings.py:103) with the same offer interface."""

    def __init__(self):
        self.fps: set[str] = set()

    def contains_batch(self, values) -> np.ndarray:
        return np.fromiter((v in self.fps for v in values), dtype=bool, count=len(values))

    def add_batch(self, values) -> None:
        self.fps.update(values)

    def offer_batch(self, values) -> np.ndarray:
        out = np.zeros(len(values), dtype=bool)
        for i, v in enumerate(values):
            if v not in self.fps:
                self.fps.add(v)
                out[i] = True
        return out

    def delete_batch(self, values) -> np.ndarray:
        out = np.zeros(len(values), dtype=bool)
        for i, v in enumerate(values):
            if v in self.fps:
                self.fps.discard(v)
                out[i] = True
        return out

    def state(self) -> dict:
        return {"mode": "exact", "fps": np.array(sorted(self.fps), dtype=object)}

    @classmethod
    def from_state(cls, st: dict) -> "ExactSet":
        obj = cls()
        obj.fps = set(st["fps"].tolist())
        return obj
