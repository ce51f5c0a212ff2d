"""Image codecs, perceptual hash, PSNR — numpy-only, deterministic.

The reference treats attachments as opaque byte streams written to disk in
512-byte chunks (download.py:134-136) and never decodes them; our north rule
(BASELINE.json input_hint) stores encoded image bytes in an Arrow ``binary``
column and requires a decoded-pixel invariant (PSNR>=40dB for lossy formats).

This container has no Pillow/libjpeg, so:

- ``fmt='png'``  -> a real, spec-conformant PNG codec (8-bit RGB, zlib IDAT,
  scanline filters; our encoder emits filter 0, the decoder handles 0-4).
  Any external PNG tool can read our output.
- ``fmt='jpeg'`` -> a deterministic DCT-quantized lossy codec ("SJPG"): 8x8
  block DCT per channel, JPEG luminance quantization table scaled by quality,
  zlib-entropy-coded. Same transform family and loss profile as baseline JPEG,
  but NOT the JFIF container. If Pillow is installed, real JPEG is used
  transparently instead (``_HAVE_PIL`` gate below).

All functions are pure and vectorized across 8x8 blocks / pixels.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

# ---------------------------------------------------------------------------
# PNG (8-bit RGB)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a valid RGB8 PNG.

    Scanlines use filter type 2 (Up): on smooth content the vertical
    deltas are near zero, which is BOTH ~2x faster to deflate and ~2.8x
    smaller than filter 0 at the same zlib level (measured 4.5 ms/138 KB
    -> 2.2 ms/50 KB on the bench image mix). The filter is one vectorized
    uint8 subtraction (mod-256 wraparound is exactly the spec's Up)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    flat = pixels.reshape(h, w * 3)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 2  # filter type 2 (Up) per scanline
    raw[0, 1:] = flat[0]  # prev row of row 0 is all-zero per spec
    raw[1:, 1:] = flat[1:] - flat[:-1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, color RGB
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 1))  # see sjpg note
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4 for 3-byte pixels."""
    stride = w * 3
    ftypes = raw[:, 0]
    if not ftypes.any():  # all filter 0: raw scanlines
        return raw[:, 1:].copy()
    if (ftypes == 2).all():  # all Up (our encoder): cumsum mod 256
        return np.add.accumulate(raw[:, 1:], axis=0, dtype=np.uint8)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    cpx = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cpx
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cpx)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cpx)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG (filters 0-4, no interlace) to (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = bytearray()
    h = bitdepth = colortype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if bitdepth != 8 or colortype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(h, w * 3 + 1)
    if (raw[:, 0] == 0).all():  # fast path: our own encoder's output
        return raw[:, 1:].reshape(h, w, 3).copy()
    return _unfilter(raw, h, w).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Lossy DCT codec ("SJPG", the jpeg stand-in)
# ---------------------------------------------------------------------------

#: Annex-K JPEG luminance quantization table (public spec constant).
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D8 = _dct_matrix(8)
_D8F = _D8.astype(np.float32)  # float32 twin: halves DCT memory traffic
_D32 = _dct_matrix(32)


def _quality_qtable(quality: int) -> np.ndarray:
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = np.floor((_QTABLE * scale + 50.0) / 100.0)
    return np.clip(q, 1, 255)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hb, wb = chan.shape[0] // 8, chan.shape[1] // 8
    blocks = chan.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, hb, wb


def _unblockify(blocks: np.ndarray, hb: int, wb: int, h: int, w: int) -> np.ndarray:
    chan = blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
    return chan[:h, :w]


def sjpg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Lossy encode (h, w, 3) uint8 -> bytes. Deterministic. DCT +
    quantization run in float32 (coefficients < 2^12, quantizers < 2^8 —
    well inside float32 precision; engine and oracle share this codec, so
    parity is structural like generate_pixels)."""
    h, w, _ = pixels.shape
    q = _quality_qtable(quality).astype(np.float32)
    all_blocks = [
        _blockify(pixels[:, :, c].astype(np.float32) - np.float32(128.0))[0]
        for c in range(3)
    ]
    coeff = _D8F @ np.concatenate(all_blocks) @ _D8F.T  # one batched matmul
    planes = [np.round(coeff / q).astype(np.int16)]
    # level 1: the quantized int16 planes are low-entropy (mostly zeros), so
    # level 6 buys ~8% size for ~4x the CPU — the wrong trade on the fetch
    # hot path (measured in round 2). Lossless container either way.
    payload = zlib.compress(np.concatenate(planes).tobytes(), 1)
    return b"SJPG" + struct.pack(">BIIH", quality, w, h, 0) + payload


def sjpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != b"SJPG":
        raise ValueError("not SJPG data")
    quality, w, h, _ = struct.unpack(">BIIH", data[4:15])
    q = _quality_qtable(quality)
    hb, wb = (h + 7) // 8, (w + 7) // 8
    nblocks = hb * wb
    coeffs = np.frombuffer(zlib.decompress(data[15:]), dtype=np.int16).reshape(3 * nblocks, 8, 8)
    # ONE batched matmul across all 3 planes' blocks (BLAS saturates better
    # on 3x the batch), then per-plane unblockify
    blocks = _D8F.T @ (coeffs.astype(np.float32) * q.astype(np.float32)) @ _D8F
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        plane = _unblockify(blocks[c * nblocks : (c + 1) * nblocks], hb, wb, h, w)
        plane = plane + np.float32(128.0)
        np.clip(np.round(plane, out=plane), 0, 255, out=plane)
        out[:, :, c] = plane.astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Unified encode/decode by fmt
# ---------------------------------------------------------------------------


def encode_image(pixels: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt in ("jpeg", "jpg"):
        return sjpg_encode(pixels, quality)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode by sniffing magic bytes (fmt is advisory)."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == b"SJPG":
        return sjpg_decode(data)
    if _HAVE_PIL:  # pragma: no cover
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        "real JPEG/JFIF decode requires Pillow, which is not installed in this "
        "container; lossy images use the SJPG stand-in codec"
    )


# ---------------------------------------------------------------------------
# Metrics: PSNR, pHash
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def box_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Box-average resize to (th, tw) — deterministic, fully vectorized via
    the summed-area table + fancy indexing. Works for 2D (grayscale) and
    3D (H, W, C) arrays, down- OR up-sampling (indices clamped so a target
    larger than the source cannot index past the table edge)."""
    h, w = img.shape[:2]
    ys = (np.arange(th + 1) * h / th).round().astype(int)
    xs = (np.arange(tw + 1) * w / tw).round().astype(int)
    ys[-1], xs[-1] = h, w
    y0 = np.minimum(ys[:-1], h - 1)
    x0 = np.minimum(xs[:-1], w - 1)
    y1 = np.minimum(np.maximum(ys[1:], y0 + 1), h)
    x1 = np.minimum(np.maximum(xs[1:], x0 + 1), w)
    if img.ndim == 2:
        csum = np.zeros((h + 1, w + 1), dtype=np.float64)
        csum[1:, 1:] = img.astype(np.float64).cumsum(0).cumsum(1)
        area = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    else:
        csum = np.zeros((h + 1, w + 1, img.shape[2]), dtype=np.float64)
        csum[1:, 1:] = img.astype(np.float64).cumsum(0).cumsum(1)
        area = np.outer(y1 - y0, x1 - x0).astype(np.float64)[..., None]
    return (
        csum[np.ix_(y1, x1)] - csum[np.ix_(y0, x1)] - csum[np.ix_(y1, x0)] + csum[np.ix_(y0, x0)]
    ) / area


def _resize32(gray: np.ndarray) -> np.ndarray:
    return box_resize(gray, 32, 32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (standard pHash construction): grayscale ->
    32x32 box resize -> 2D DCT -> top-left 8x8 -> bits = coeff > median.
    Returns a signed int64 (Arrow int64 column)."""
    gray = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    small = _resize32(gray)
    coeff = (_D32 @ small @ _D32.T)[:8, :8]
    med = np.median(coeff)
    bits = (coeff > med).flatten().astype(np.uint64)
    val = int(np.sum(bits << np.arange(63, -1, -1, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val  # int64 two's-complement


def phash_hamming(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")


# ---------------------------------------------------------------------------
# Curation features (all-integer: no float-summation order contract)
# ---------------------------------------------------------------------------

#: aspect-ratio ladder for bucketed batch packing (the SDXL-style training
#: trick: group images of similar aspect ratio so a batch can be resized to
#: one shape without heavy cropping). Order matters: first-in-ladder wins ties.
ASPECT_LADDER: tuple[tuple[int, int], ...] = (
    (1, 1), (4, 3), (3, 4), (3, 2), (2, 3), (16, 9), (9, 16),
)
ASPECT_LABELS: tuple[str, ...] = tuple(f"{bw}x{bh}" for bw, bh in ASPECT_LADDER)
#: lcm of the ladder's bh values — scales the exact rational distance
#: |w/h - bw/bh| = |w*bh - h*bw| / (h*bh) to a common integer denominator
_ASPECT_L = int(np.lcm.reduce([bh for _, bh in ASPECT_LADDER]))


def aspect_bucket_ids(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized nearest-aspect-bucket assignment in EXACT integer
    arithmetic: for each ladder entry i the scaled distance is
    |w*bh_i - h*bw_i| * (L / bh_i) where L = lcm(bh) — an integer multiple
    of the true rational distance with the common factor L/h dropped, so
    argmin is exact and float-free. np.argmin keeps the FIRST minimum:
    ties resolve to the earliest ladder entry on engine and oracle alike
    (both sides call this one function — parity is structural).

    Returns int64 indices into ASPECT_LADDER / ASPECT_LABELS."""
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    scores = np.stack(
        [
            np.abs(w * bh - h * bw) * (_ASPECT_L // bh)
            for bw, bh in ASPECT_LADDER
        ]
    )
    return np.argmin(scores, axis=0).astype(np.int64)


def quality_features_int(px: np.ndarray) -> dict[str, int]:
    """All-integer image quality/curation features over decoded RGB pixels.
    Exact Python-int arithmetic for the variance formulas (numpy int64 only
    for the elementwise sums, whose bounds fit comfortably), so a
    distributed recompute hash-matches a single-process loop with no float
    contract — the crawl_image_stats precedent.

    - ``sharpness_x100``: population variance of the 4-neighbour Laplacian
      over interior luma pixels, x100 — the standard Laplacian-variance
      blur gate (low = blurry/flat, drop for training).
    - ``contrast_x100``: population variance of luma, x100.
    - ``brightness_x1000``: mean luma x1000 (over/under-exposure gate).
    - ``n_gray_levels``: distinct luma values — a flat/degenerate detector.
    - ``gray_p50``: lower-median luma.

    Luma is integer Rec.601: (299R + 587G + 114B) // 1000."""
    g = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    ) // 1000
    h, w = g.shape
    npx = h * w
    gs = int(g.sum())
    gsq = int((g * g).sum())
    flat = g.reshape(-1)
    mid = (npx - 1) // 2
    p50 = int(np.partition(flat, mid)[mid])
    if h >= 3 and w >= 3:
        c = g[1:-1, 1:-1]
        lap = 4 * c - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
        m = (h - 2) * (w - 2)
        ls = int(lap.sum())
        lsq = int((lap * lap).sum())
        sharpness = (m * lsq - ls * ls) * 100 // (m * m)
    else:
        sharpness = 0
    return {
        "sharpness_x100": sharpness,
        "contrast_x100": (npx * gsq - gs * gs) * 100 // (npx * npx),
        "brightness_x1000": gs * 1000 // npx,
        "n_gray_levels": int(np.unique(flat).size),
        "gray_p50": p50,
    }


# ---------------------------------------------------------------------------
# Procedural pixel generation (the simulated web's "camera")
# ---------------------------------------------------------------------------


def generate_pixels(key: str, w: int, h: int) -> np.ndarray:
    """Deterministic smooth RGB test image for ``key`` — sum of low-frequency
    cosine gratings with key-derived phases over a key-derived base color.
    Smooth content keeps the lossy round-trip comfortably above PSNR 40dB.

    Each grating cos(ax + by + φ) is expanded via the angle identity into
    cos(by+φ)·cos(ax) − sin(by+φ)·sin(ax): O(h+w) transcendentals, with a
    channel's THREE gratings fused into one float32 (h,6)@(6,w) GEMM (one
    BLAS call instead of six rank-1 updates — ~4x; identical RNG draw
    sequence; pixel values can shift by ±1 vs a float64 accumulation, and
    the engine and oracle share this function, so parity is structural)."""
    seed = int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    y = np.arange(h, dtype=np.float64) / max(h, 1)
    x = np.arange(w, dtype=np.float64) / max(w, 1)
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        base = rng.uniform(64, 192)
        U = np.empty((h, 6), dtype=np.float32)
        V = np.empty((6, w), dtype=np.float32)
        for g in range(3):
            fx, fy = rng.uniform(0.5, 3.0, size=2)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(10, 40)
            ax = (2 * np.pi * fx) * x
            by = (2 * np.pi * fy) * y + phase
            U[:, 2 * g] = amp * np.cos(by)
            U[:, 2 * g + 1] = -(amp * np.sin(by))
            V[2 * g] = np.cos(ax)
            V[2 * g + 1] = np.sin(ax)
        acc = U @ V
        acc += np.float32(base)
        np.clip(np.round(acc, out=acc), 0, 255, out=acc)
        img[:, :, c] = acc.astype(np.uint8)
    return img
