"""Property-based tests (hypothesis) for the pure kernels."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.slow

from spiderman_ray.functions.aescipher import CipherAES
from spiderman_ray.functions.hashing import BLOOM_SEEDS, bloom_positions, fingerprints
from spiderman_ray.functions.imaging import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from spiderman_ray.functions.textops import clean, str2dict
from spiderman_ray.state.bloom import NumpyBloom

text_strategy = st.text(min_size=0, max_size=200)


@given(st.lists(text_strategy, min_size=0, max_size=30))
@settings(max_examples=50, deadline=None)
def test_fingerprints_match_hashlib(urls):
    fps = fingerprints(urls)
    assert list(fps) == [hashlib.md5(u.encode("utf-8")).hexdigest().upper() for u in urls]


@given(st.lists(text_strategy, min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_bloom_positions_match_reference_recurrence(values):
    m = 1 << 23
    pos = bloom_positions(values, m, k=7)
    for i, v in enumerate(values):
        md = hashlib.md5(v.encode("utf-8")).hexdigest()
        for j, seed in enumerate(BLOOM_SEEDS):
            ret = 0
            for ch in md:
                ret += seed * ret + ord(ch)
            assert int(pos[i, j]) == ((m - 1) & ret)


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=60))
@settings(max_examples=30, deadline=None)
def test_bloom_no_false_negatives(values):
    bf = NumpyBloom(mem_mb=1, k=7)
    bf.add_batch(values)
    assert bf.contains_batch(values).all()


@given(text_strategy)
@settings(max_examples=50, deadline=None)
def test_clean_idempotent_and_removes_dirt(value):
    c = clean(value)
    assert clean(c) == c
    assert not any(ch in c for ch in "\001\xa0\n\t\r")
    assert c == c.strip()


@given(st.integers(1, 48), st.integers(1, 48), st.integers(0, 2**31))
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_arbitrary_dims(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (png_decode(png_encode(px)) == px).all()


@given(st.integers(8, 64), st.integers(8, 64), st.integers(0, 2**31))
@settings(max_examples=15, deadline=None)
def test_lossy_roundtrip_shape_and_phash_total(w, h, seed):
    rng = np.random.default_rng(seed)
    # smooth-ish image: random low-res upsampled (noise defeats any codec)
    small = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    px = np.kron(small, np.ones((h // 4 + 1, w // 4 + 1, 1), dtype=np.uint8))[:h, :w]
    out = decode_image(encode_image(px, "jpeg"))
    assert out.shape == px.shape
    assert psnr(px, out) > 25  # blocky content: decent but not exact
    assert isinstance(phash64(out), int)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=120))
@settings(max_examples=40, deadline=None)
def test_aes_roundtrip_arbitrary_text(msg):
    c = CipherAES(pad_method="PKCS5Padding", code_method="base64", cipher_method="MODE_CBC",
                  iv="ABCDEF1G34123412")
    assert c.decrypt(c.encrypt(msg)) == msg


@given(st.dictionaries(st.text(alphabet="abcdefgh", min_size=1, max_size=8),
                       st.text(alphabet="xyz123 ", min_size=0, max_size=10), max_size=8))
@settings(max_examples=40, deadline=None)
def test_str2dict_roundtrip(d):
    block = "\n".join(f"{k}: {v}" for k, v in d.items())
    assert str2dict(block) == {k: v.strip() for k, v in d.items()}


@given(
    st.text(alphabet="abcdef", min_size=1, max_size=12),
    st.text(alphabet="abcdef", min_size=1, max_size=12),
)
@settings(max_examples=80, deadline=None)
def test_edit_le1_matches_levenshtein(a, b):
    """The deletion-neighborhood join's fast <=1 verifier agrees with a
    full Levenshtein DP on arbitrary string pairs."""
    from spiderman_ray.pipelines.relational import _edit_le1

    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    assert _edit_le1(a, b) == (d[-1] <= 1)


@given(st.text(alphabet="abcdexyz", min_size=1, max_size=16), st.integers(0, 30))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_word_reconstructs_and_respects_merges(word, n_merges):
    """BPE encoding of any word reconstructs the word exactly (tokens
    concatenate back, modulo the </w> sentinel) and never produces a pair
    that a learned merge should have merged."""
    from spiderman_ray.pipelines.bpe import EOW, bpe_encode_word, bpe_reference

    merges = bpe_reference({word: 3, "the": 5, "thexy": 2}, n_merges)
    ranks = {(l, r): k for k, l, r, _ in merges}
    toks = bpe_encode_word(word, ranks)
    assert "".join(toks) == word + EOW
    for i in range(len(toks) - 1):
        assert (toks[i], toks[i + 1]) not in ranks
