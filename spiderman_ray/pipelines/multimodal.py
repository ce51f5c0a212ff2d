"""Multimodal column operators: opaque binary payloads + typed metadata.

Images are REAL here (our own codecs); audio/video decode is STUBBED behind
clearly-marked gates because this container ships no media libraries — but
the Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is genuine and tested, so dropping in a real decoder is a one-line
change in the actor's ``__init__``.

Batch-size guidance: rows are wide (binary payloads), so stages use small
``batch_size`` and ``batch_format='pyarrow'`` (binary columns do not
round-trip pandas well — they become object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from spiderman_ray.functions.imaging import box_resize, decode_image, encode_image, phash64
from spiderman_ray.sources.table_io import read_dataset

#: Output schema of the thumbnail stage.
THUMBNAILS = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
    ]
)

#: Contract for (stubbed) audio feature extraction.
AUDIO_FEATURES = pa.schema(
    [
        ("clip_id", pa.string()),
        ("duration_ms", pa.int64()),
        ("rms_x1e6", pa.int64()),
        ("n_frames", pa.int32()),
    ]
)

#: Contract for (stubbed) video frame sampling.
VIDEO_FRAMES = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
    ]
)


def _box_resize(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Shared summed-area-table resize (functions.imaging.box_resize) with
    uint8 rounding — handles up- and down-sampling."""
    return np.clip(np.round(box_resize(px, tw, th)), 0, 255).astype(np.uint8)


class Thumbnailer:
    """Actor-pool stage: decode -> box-resize -> re-encode. Codec state
    (quality, target size) fixed per actor at init."""

    def __init__(self, size: int = 32, quality: int = 90):
        self.size = size
        self.quality = quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "phash")}
        for row in batch.to_pylist():
            px = decode_image(row["bytes"])
            thumb = _box_resize(px, self.size, self.size)
            fmt = row.get("fmt") or "png"
            data = encode_image(thumb, fmt, self.quality)
            out["image_id"].append(row["image_id"])
            out["bytes"].append(data)
            out["w"].append(self.size)
            out["h"].append(self.size)
            out["fmt"].append(fmt)
            out["phash"].append(phash64(thumb))
        return pa.Table.from_pydict(out, schema=THUMBNAILS)


def thumbnails(images_uri: str, size: int = 32, concurrency: int = 4) -> rd.Dataset:
    """Image thumbnail pipeline over an input_hint-shaped table."""
    from spiderman_ray.pipelines import pool_size

    return read_dataset(images_uri).map_batches(
        Thumbnailer,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class AudioFeatures:
    """Actor-pool stage contract for audio feature extraction.

    STUB: this container has no audio codec library. ``deterministic_fake``
    mode exercises the full Ray plumbing with a fake decoder (bytes ->
    pseudo-samples via a seeded hash), which is what the tests run; with a
    real decoder (librosa/soundfile) only ``_decode`` changes.
    """

    def __init__(self, mode: str = "deterministic_fake"):
        if mode not in ("deterministic_fake",):
            raise NotImplementedError(
                "real audio decode requires an audio library not present in "
                "this container; use mode='deterministic_fake'"
            )
        self.mode = mode

    def _decode(self, clip_id: str, payload: bytes) -> np.ndarray:
        """Fake PCM decode: payload bytes cycled/padded to 1024 integer
        samples d = 2*byte - 255 in [-255, 255]. Deterministic AND
        independently recomputable — the driver's SQL oracle re-derives the
        identical samples from hex(encode(text)), making the actor-pool
        output hash-checkable (real rms over exact-integer energy:
        rms = sqrt(sum(d^2))/8192 since mean(d^2/256^2) over 1024)."""
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            b = np.zeros(1, dtype=np.uint8)
        return 2 * b[np.arange(1024) % len(b)].astype(np.int64) - 255

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("clip_id", "duration_ms", "rms_x1e6", "n_frames")}
        for row in batch.to_pylist():
            d = self._decode(row["clip_id"], row["payload"])
            energy = int(np.sum(d * d))  # exact: <= 1024 * 255^2 << 2^53
            out["clip_id"].append(row["clip_id"])
            out["duration_ms"].append(len(d) * 1000 // 16000)
            out["rms_x1e6"].append(int(np.sqrt(float(energy)) / 8192.0 * 1000000.0))
            out["n_frames"].append(len(d) // 256)
        return pa.Table.from_pydict(out, schema=AUDIO_FEATURES)


class VideoFrameSampler:
    """Actor-pool stage contract for video frame sampling.

    STUB decoder: this container has no video codec library, so
    ``deterministic_fake`` mode synthesizes frames from the payload bytes
    (seeded, reproducible) — the Ray plumbing (actor pool, small batches,
    binary in / binary frames out, every-Nth sampling, VIDEO_FRAMES
    schema) is real and tested; a real decoder (pyav/ffmpeg) replaces
    ``_decode_frames`` only."""

    def __init__(self, every_nth: int = 8, frame_px: int = 16,
                 mode: str = "deterministic_fake"):
        if mode not in ("deterministic_fake",):
            raise NotImplementedError(
                "real video decode requires a codec library not present in "
                "this container; use mode='deterministic_fake'"
            )
        self.every_nth = every_nth
        self.frame_px = frame_px

    def _decode_frames(self, video_id: str, payload: bytes) -> np.ndarray:
        """(n_frames, px, px, 3) uint8 — fake but deterministic: frame count
        scales with payload size, pixels seeded by (payload head, frame)."""
        n_frames = max(1, len(payload) // 256)
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") ^ len(payload)
        rng = np.random.default_rng(seed)
        return rng.integers(
            0, 256, size=(n_frames, self.frame_px, self.frame_px, 3), dtype=np.uint8
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from spiderman_ray.functions.imaging import encode_image

        out = {k: [] for k in ("video_id", "frame_idx", "frame_bytes", "w", "h")}
        for row in batch.to_pylist():
            frames = self._decode_frames(row["video_id"], row["payload"])
            for idx in range(0, len(frames), self.every_nth):
                out["video_id"].append(row["video_id"])
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(encode_image(frames[idx], "png"))
                out["w"].append(self.frame_px)
                out["h"].append(self.frame_px)
        return pa.Table.from_pydict(out, schema=VIDEO_FRAMES)


def video_frame_sample(videos: rd.Dataset, every_nth: int = 8,
                       concurrency: int = 4) -> rd.Dataset:
    """Video frame-sampling pipeline over a (video_id, payload) table —
    same stage shape as Thumbnailer (actor pool, small batches, binary
    in/out). Decode is a declared deterministic fake (no codec in this
    container); everything Ray-side is real."""
    from spiderman_ray.pipelines import pool_size

    return videos.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_nth": every_nth},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
