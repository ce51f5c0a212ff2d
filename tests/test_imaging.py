import numpy as np
import pytest

from spiderman_ray.functions.imaging import (
    decode_image,
    encode_image,
    generate_pixels,
    phash64,
    phash_hamming,
    png_decode,
    png_encode,
    psnr,
    sjpg_decode,
    sjpg_encode,
)


@pytest.mark.parametrize("shape", [(32, 32), (64, 48), (100, 37), (256, 256)])
def test_png_roundtrip_lossless(shape):
    px = generate_pixels(f"img-{shape}", shape[1], shape[0])
    data = png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = png_decode(data)
    assert (out == px).all()


def test_png_decoder_handles_filtered_scanlines():
    """Decoder must handle filters 1-4, not just our encoder's filter 0."""
    import struct
    import zlib

    px = generate_pixels("filters", 16, 8)
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ftype = [0, 1, 2, 3, 4][y % 5]
        raw.append(ftype)
        enc = np.zeros(w * 3, dtype=np.int32)
        for x in range(w * 3):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (png_decode(blob) == px).all()


@pytest.mark.parametrize("shape", [(32, 32), (64, 48), (100, 37)])
def test_sjpg_lossy_psnr_above_40(shape):
    px = generate_pixels(f"lossy-{shape}", shape[1], shape[0])
    data = sjpg_encode(px, quality=90)
    out = sjpg_decode(data)
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p >= 40.0, f"PSNR {p:.1f} < 40"


def test_sjpg_actually_lossy_and_smaller():
    px = generate_pixels("compress-me", 128, 128)
    lossy = sjpg_encode(px, quality=90)
    lossless = png_encode(px)
    assert not (sjpg_decode(lossy) == px).all()  # genuinely lossy
    assert len(lossy) < len(lossless)


def test_encode_decode_by_fmt():
    px = generate_pixels("fmt", 40, 40)
    assert (decode_image(encode_image(px, "png"), "png") == px).all()
    assert psnr(px, decode_image(encode_image(px, "jpeg"), "jpeg")) >= 40


def test_phash_properties():
    a = generate_pixels("imgA", 64, 64)
    b = generate_pixels("imgB", 64, 64)
    ha, hb = phash64(a), phash64(b)
    assert isinstance(ha, int)
    assert np.iinfo(np.int64).min <= ha <= np.iinfo(np.int64).max
    assert ha == phash64(a)  # deterministic
    assert phash_hamming(ha, ha) == 0
    assert phash_hamming(ha, hb) > 4  # different images differ
    # robust to lossy round-trip
    a2 = sjpg_decode(sjpg_encode(a, quality=90))
    assert phash_hamming(ha, phash64(a2)) <= 4


def test_generate_pixels_deterministic():
    a = generate_pixels("k", 33, 17)
    b = generate_pixels("k", 33, 17)
    assert a.shape == (17, 33, 3) and (a == b).all()
    assert generate_pixels("k2", 33, 17).tobytes() != a.tobytes()


def test_aspect_bucket_ids_known_and_tiebreak():
    from spiderman_ray.functions.imaging import ASPECT_LABELS, aspect_bucket_ids

    w = np.array([100, 400, 300, 1600, 90, 300, 17])
    h = np.array([100, 300, 400, 900, 160, 200, 12])
    got = [ASPECT_LABELS[i] for i in aspect_bucket_ids(w, h)]
    # 17:12 is rationally equidistant from 4:3 and 3:2 (|3*17-4*12|/3 ==
    # |2*17-3*12|/2 == 1): first-in-ladder wins -> 4x3
    assert got == ["1x1", "4x3", "3x4", "16x9", "9x16", "3x2", "4x3"]


def test_quality_features_int_flat_and_gradient():
    from spiderman_ray.functions.imaging import quality_features_int

    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    f = quality_features_int(flat)
    assert f["sharpness_x100"] == 0 and f["contrast_x100"] == 0
    assert f["brightness_x1000"] == 77_000
    assert f["n_gray_levels"] == 1 and f["gray_p50"] == 77
    # horizontal ramp: zero Laplacian in the interior (linear signal), but
    # nonzero contrast and full gray range
    ramp = np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1))
    px = np.stack([ramp] * 3, axis=2)
    g = quality_features_int(px)
    assert g["sharpness_x100"] == 0
    assert g["contrast_x100"] > 0 and g["n_gray_levels"] == 64
    # checkerboard: maximal Laplacian energy, sharpness >> ramp's
    cb = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    c = quality_features_int(np.stack([cb] * 3, axis=2))
    assert c["sharpness_x100"] > 10_000


def test_quality_features_int_matches_bigint_semantics():
    """Feature arithmetic must be exact Python int (no int64 overflow path):
    spot-check the variance identity on a generated image."""
    from spiderman_ray.functions.imaging import quality_features_int

    px = generate_pixels("qf", 48, 32)
    f = quality_features_int(px)
    g = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    ) // 1000
    n = g.size
    var100 = (n * int((g * g).sum()) - int(g.sum()) ** 2) * 100 // (n * n)
    assert f["contrast_x100"] == var100
    assert 0 <= f["gray_p50"] <= 255
