"""WAV (RIFF/WAVE PCM) codec — stdlib struct + numpy, deterministic.

The reference treats attachments as opaque byte streams (download.py:134-136)
and never decodes them; our multimodal surface decodes for real where a
public format allows it without a codec library. RIFF/WAVE PCM is such a
format: the container is a chunk list (fourcc + u32 length + payload) and
PCM samples are raw little-endian integers, so a spec-conformant encoder
and a robust chunk-walking decoder need nothing beyond struct/numpy —
exactly like the in-repo PNG codec. Any external WAV tool can read our
output, and we can read any canonical PCM WAV (mono/stereo, 8/16-bit,
unknown chunks skipped).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Pack int16 samples ((n,) mono or (n, ch)) into a canonical WAV file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved frames, little-endian
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV -> ((n, ch) int32 samples, sample rate).

    A real chunk walker: fmt/data may appear in any order with unknown
    chunks (LIST, fact, cue, ...) in between; lengths are validated and odd
    chunks are word-aligned per the RIFF spec. 8-bit PCM (unsigned,
    rebased to signed) and 16-bit PCM are supported."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt_fields = None
    data = None
    while pos + 8 <= end:
        cid, clen = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # word alignment
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt_fields
    if audio_fmt != 1:
        raise ValueError(f"only PCM (fmt 1) supported, got {audio_fmt}")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    if bits == 16:
        flat = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.int32)
    elif bits == 8:  # 8-bit WAV PCM is unsigned
        flat = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(flat) // ch
    return flat[: n * ch].reshape(n, ch), rate


def make_audio(data: bytes, rate: int = 16000, n_samples: int = 1024) -> bytes:
    """Deterministic synthetic clip from opaque bytes (test/bench input
    generator): sample j = 2*data[j % len] - 255 in [-255, 255], cycled to
    ``n_samples`` mono int16 values — exact-integer energy, so the driver's
    SQL oracle re-derives rms from hex(encode(text)) with no shared code."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) == 0:
        b = np.zeros(1, dtype=np.uint8)
    d = (2 * b[np.arange(n_samples) % len(b)].astype(np.int32) - 255).astype(np.int16)
    return encode_wav(d, rate)


def wav_fingerprints(payload: bytes, window: int = 128) -> list[int]:
    """Per-window 64-bit acoustic fingerprints of a PCM WAV clip — the
    chromaprint shape without an FFT, in EXACT integer arithmetic (shared
    engine/oracle: parity is structural). The clip's first channel is cut
    into non-overlapping ``window``-sample windows (the trailing partial
    window is dropped); each window splits into 64 equal sub-blocks whose
    integer energy e_k = sum(s^2) is compared to its neighbour: bit k is
    set iff e_k > e_{k-1} (e_{-1} = 0). Energy DELTAS survive gain-free
    re-containering and exact partial copies — the dedup target here;
    a real system would swap in spectral bands the same way.

    ``window`` must be a multiple of 64. Returns signed-int64 values
    (Arrow int64 column convention, the phash64 two's-complement trick)."""
    if window % 64:
        raise ValueError("window must be a multiple of 64")
    samples, _rate = decode_wav(payload)
    mono = samples[:, 0].astype(np.int64)
    n_win = len(mono) // window
    out: list[int] = []
    if n_win == 0:
        return out
    sub = window // 64
    blocks = mono[: n_win * window].reshape(n_win, 64, sub)
    energy = (blocks * blocks).sum(axis=2)  # (n_win, 64) int64, exact
    prev = np.concatenate([np.zeros((n_win, 1), dtype=np.int64), energy[:, :-1]], axis=1)
    bits = (energy > prev).astype(np.uint64)
    vals = (bits << np.arange(63, -1, -1, dtype=np.uint64)).sum(axis=1)
    for v in vals:
        v = int(v)
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out
