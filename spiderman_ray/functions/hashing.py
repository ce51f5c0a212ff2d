"""Fingerprints and the reference bloom hash family, vectorized.

Reference semantics reproduced here (see /root/reference):

- Row/request keys are ``md5(url).hexdigest().upper()`` (SP/utils/base.py:38-40,
  used as ``pkey``/``fkey`` in SP/spiders/zhifang.py:77,115). We pin the request
  fingerprint to the same scheme (uppercase md5 of the canonical URL) — this is
  the engine's URL-seen-set key.
- The bloom filter (SP/bloom_dupefilter.py:13-56) re-hashes its input value with
  md5 (lowercase hexdigest), picks a shard with ``int(hex[0:2], 16) % num`` and
  sets k bits, one per seed in [5,7,11,13,31,37,61], where the bit position is

      ret = 0
      for c in md5hex: ret += seed * ret + ord(c)   # == ret*(seed+1) + ord(c)
      pos = ret & (m - 1)                            # m = mem * 8 * 1024 * 1024

  ``m`` is always a power of two (mem in MiB), so masking the arbitrary-precision
  Python int by ``m-1`` is equivalent to doing the whole recurrence in uint64
  wraparound arithmetic and masking at the end (the mask keeps <= 32 low bits,
  2**64 is a multiple of m). That makes the hash family exactly vectorizable
  with numpy — `bloom_positions` below is bit-for-bit identical to the
  reference implementation, which `tests/test_hashing.py` proves against a
  straight transcription of the published algorithm.
"""

from __future__ import annotations

import hashlib

import numpy as np

#: Reference seed list, SP/bloom_dupefilter.py:29
BLOOM_SEEDS = (5, 7, 11, 13, 31, 37, 61)


def md5_hex(value: str) -> str:
    """Lowercase md5 hexdigest (SP/utils/tool.py:46-53 ``encode_md5``)."""
    return hashlib.md5(value.encode("utf-8")).hexdigest()


def md5_upper(value: str) -> str:
    """Uppercase md5 hexdigest — the reference row-key / fingerprint scheme
    (SP/utils/base.py:38-40)."""
    return md5_hex(value).upper()


def fingerprints(urls) -> np.ndarray:
    """Vectorized (per-batch) uppercase-md5 fingerprints for a column of URLs.

    md5 itself is not numpy-expressible; this is a tight C-loop via hashlib on
    the already-materialized Python strings of one Arrow batch. Returns an
    object ndarray of 32-char uppercase hex strings.
    """
    return np.array(
        [hashlib.md5(u.encode("utf-8")).hexdigest().upper() for u in urls],
        dtype=object,
    )


def _md5_hex_codes(values) -> np.ndarray:
    """(N, 32) uint64 array of the char codes of md5(value).hexdigest()."""
    digests = np.frombuffer(
        b"".join(hashlib.md5(v.encode("utf-8")).hexdigest().encode("ascii") for v in values),
        dtype=np.uint8,
    ).reshape(len(values), 32)
    return digests.astype(np.uint64)


def bloom_shards(values, num_shards: int) -> np.ndarray:
    """Shard index per value: ``int(md5hex[0:2], 16) % num_shards``
    (SP/bloom_dupefilter.py:33,40)."""
    codes = _md5_hex_codes(values)
    # hex chars: '0'-'9' => code-48, 'a'-'f' => code-87
    hi = np.where(codes[:, 0] >= 97, codes[:, 0] - 87, codes[:, 0] - 48)
    lo = np.where(codes[:, 1] >= 97, codes[:, 1] - 87, codes[:, 1] - 48)
    return ((hi * 16 + lo) % np.uint64(num_shards)).astype(np.int64)


def bloom_positions(values, m: int, k: int = 7) -> np.ndarray:
    """(N, k) bit positions in an m-bit filter, reference hash family.

    Bit-for-bit identical to SP/bloom_dupefilter.py:46-51 for power-of-two m.
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two (reference mem*8*1024*1024), got {m}")
    codes = _md5_hex_codes(values)
    mask = np.uint64(m - 1)
    out = np.empty((len(codes), k), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j, seed in enumerate(BLOOM_SEEDS[:k]):
            mult = np.uint64(seed + 1)
            ret = np.zeros(len(codes), dtype=np.uint64)
            for i in range(32):
                ret = ret * mult + codes[:, i]
            out[:, j] = ret & mask
    return out


def hash64(values) -> np.ndarray:
    """Stable 64-bit hash of strings (first 16 hex chars of md5), for
    hash-partitioning (shard/host bucketing). Not a reference scheme — our
    partitioner; deterministic across processes unlike Python's ``hash``."""
    codes = _md5_hex_codes(values)[:, :16]
    val = np.zeros(len(codes), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(16):
            nib = np.where(codes[:, i] >= 97, codes[:, i] - 87, codes[:, i] - 48)
            val = (val << np.uint64(4)) | nib
    return val.view(np.int64)
