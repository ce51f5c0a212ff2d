"""Cuckoo-filter seen set — the north rule's "bloom/cuckoo" second mode.

Standard 2-choice cuckoo filter (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014 — public algorithm): buckets of 4 slots
holding 16-bit fingerprints; an item lives in bucket ``i1 = h(x)`` or its
partner ``i2 = i1 XOR h(fingerprint)``, so membership checks probe two
buckets and DELETION is supported (remove the fingerprint from either
bucket) — the property bloom lacks, and what lets patch jobs re-offer
residual URLs through the SAME pool instead of building a fresh one
(SPJob.delete clears the whole Redis dupefilter, SP_JOBS/job.py:76-77;
deletion is the surgical version).

Like the reference's sharded bloom (SP/bloom_dupefilter.py:13-30) this
trades exactness for memory: false positives happen when another resident
of the two probed buckets shares the 16-bit fingerprint (~2e-4 at high
load); conformance under cuckoo mode is therefore probabilistic exactly
like bloom mode (see state/seen.py docstring). All derivation goes through
functions.hashing.hash64 so the filter is deterministic given insertion
order; membership SETS are order-independent even though slot layouts are
not.
"""

from __future__ import annotations

import numpy as np

from spiderman_ray.functions.hashing import hash64

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    """Batch-API cuckoo filter over string fingerprints (md5-hex fps)."""

    def __init__(self, mem_mb: int = 16, _table: np.ndarray | None = None,
                 n_added: int = 0, n_deleted: int = 0):
        if _table is not None:
            self.table = _table
        else:
            n_buckets = max(64, (mem_mb << 20) // (_SLOTS * 2))
            n_buckets = 1 << int(np.floor(np.log2(n_buckets)))  # power of two
            self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.n_buckets = len(self.table)
        self.n_added = n_added
        self.n_deleted = n_deleted

    # -- derivation --------------------------------------------------------
    def _derive(self, fps) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(fingerprint16, bucket1, bucket2) for each fp, vectorized."""
        h = hash64(list(fps)).view(np.uint64)
        f16 = (h % np.uint64(65535)).astype(np.uint16) + np.uint16(1)  # never 0
        mask = np.uint64(self.n_buckets - 1)
        i1 = (h >> np.uint64(32)) & mask
        # partner bucket: i1 XOR h(f16) — the standard partial-key trick
        hf = hash64([str(int(f)) for f in f16]).view(np.uint64)
        i2 = i1 ^ (hf & mask)
        return f16, i1.astype(np.int64), i2.astype(np.int64)

    # -- core single-item ops (batch wrappers below) -----------------------
    def _present(self, f: int, i1: int, i2: int) -> bool:
        return bool((self.table[i1] == f).any() or (self.table[i2] == f).any())

    def _insert(self, f: int, i1: int, i2: int) -> bool:
        for b in (i1, i2):
            empt = np.nonzero(self.table[b] == 0)[0]
            if len(empt):
                self.table[b, empt[0]] = f
                return True
        # evict deterministically: alternate buckets, slot = kick count % 4
        b, cur = i1, f
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            hf = int(hash64([str(cur)]).view(np.uint64)[0])
            b = int(b ^ (hf & (self.n_buckets - 1)))
            empt = np.nonzero(self.table[b] == 0)[0]
            if len(empt):
                self.table[b, empt[0]] = cur
                return True
        raise RuntimeError(
            f"cuckoo filter over capacity ({self.n_added} adds, "
            f"{self.n_buckets * _SLOTS} slots) — size shards larger"
        )

    # -- batch API (ExactSet/NumpyBloom-compatible) ------------------------
    def offer_batch(self, fps) -> np.ndarray:
        """Atomic check-then-add per fp; True = first sight (accepted)."""
        fps = list(fps)
        out = np.zeros(len(fps), dtype=bool)
        if not fps:
            return out
        f16, i1, i2 = self._derive(fps)
        for k in range(len(fps)):
            f = int(f16[k])
            if self._present(f, int(i1[k]), int(i2[k])):
                continue
            self._insert(f, int(i1[k]), int(i2[k]))
            self.n_added += 1
            out[k] = True
        return out

    def contains_batch(self, fps) -> np.ndarray:
        fps = list(fps)
        if not fps:
            return np.zeros(0, dtype=bool)
        f16, i1, i2 = self._derive(fps)
        return np.array(
            [self._present(int(f16[k]), int(i1[k]), int(i2[k])) for k in range(len(fps))],
            dtype=bool,
        )

    def add_batch(self, fps) -> None:
        self.offer_batch(fps)

    def delete_batch(self, fps) -> np.ndarray:
        """Remove each fp (True = was present and removed). Only delete fps
        that were inserted — deleting absent items is undefined for cuckoo
        filters (it can evict another item's fingerprint)."""
        fps = list(fps)
        out = np.zeros(len(fps), dtype=bool)
        if not fps:
            return out
        f16, i1, i2 = self._derive(fps)
        for k in range(len(fps)):
            f = int(f16[k])
            for b in (int(i1[k]), int(i2[k])):
                hit = np.nonzero(self.table[b] == f)[0]
                if len(hit):
                    self.table[b, hit[0]] = 0
                    self.n_deleted += 1
                    out[k] = True
                    break
        return out

    # -- snapshot ----------------------------------------------------------
    def state(self) -> dict:
        return {
            "mode": "cuckoo",
            "table": self.table,
            "n_added": self.n_added,
            "n_deleted": self.n_deleted,
        }

    @classmethod
    def from_state(cls, st) -> "CuckooFilter":
        return cls(
            _table=np.array(st["table"], dtype=np.uint16),
            n_added=int(st["n_added"]),
            n_deleted=int(st["n_deleted"]),
        )

    @property
    def bits(self) -> np.ndarray:
        """Layout dump for tests (name kept parallel to NumpyBloom.bits)."""
        return self.table
