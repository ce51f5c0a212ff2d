"""Unit tests: fingerprints + bit-for-bit bloom hash family parity.

The parity oracle below is a straight transcription of the algorithm
published in the reference (SP/bloom_dupefilter.py:32-56) — plain-Python,
arbitrary-precision — against which the vectorized uint64 implementation
must agree exactly.
"""

import hashlib

import numpy as np
import pytest

from spiderman_ray.functions.hashing import (
    BLOOM_SEEDS,
    bloom_positions,
    bloom_shards,
    fingerprints,
    hash64,
    md5_upper,
)


def _ref_md5(value: str) -> str:
    return hashlib.md5(value.encode()).hexdigest()


def _ref_hash(value: str, seed: int, m: int) -> int:
    # SP/bloom_dupefilter.py:46-51 semantics (reimplemented, not copied)
    ret = 0
    for ch in _ref_md5(value):
        ret += seed * ret + ord(ch)
    return (m - 1) & ret


def test_md5_upper_matches_reference_scheme():
    # SP/utils/base.py:38-40: md5 hexdigest uppercased
    assert md5_upper("https://a.example/x") == hashlib.md5(
        b"https://a.example/x"
    ).hexdigest().upper()


def test_fingerprints_vectorized():
    urls = [f"https://h{i}.example/p/{i}" for i in range(100)]
    fps = fingerprints(urls)
    assert list(fps) == [md5_upper(u) for u in urls]


@pytest.mark.parametrize("mem_mb", [1, 4, 256])
def test_bloom_positions_bit_for_bit(mem_mb):
    m = mem_mb * 8 * 1024 * 1024
    values = [md5_upper(f"url-{i}") for i in range(200)] + ["", "a", "中文url"]
    pos = bloom_positions(values, m, k=7)
    for i, v in enumerate(values):
        for j, seed in enumerate(BLOOM_SEEDS):
            assert int(pos[i, j]) == _ref_hash(v, seed, m), (v, seed)


def test_bloom_positions_rejects_non_pow2():
    with pytest.raises(ValueError):
        bloom_positions(["x"], m=1000)


def test_bloom_shards():
    values = [f"fp{i}" for i in range(300)]
    shards = bloom_shards(values, 8)
    for v, s in zip(values, shards):
        assert int(s) == int(_ref_md5(v)[0:2], 16) % 8


def test_hash64_stable_and_spread():
    vals = [f"host{i}.example" for i in range(1000)]
    h1, h2 = hash64(vals), hash64(vals)
    assert (h1 == h2).all()
    # well spread over 64 buckets
    counts = np.bincount((h1.view(np.uint64) % np.uint64(64)).astype(np.int64), minlength=64)
    assert counts.min() > 0
