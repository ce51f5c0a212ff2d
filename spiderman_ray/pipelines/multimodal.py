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
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") ^ len(payload)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(1024)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("clip_id", "duration_ms", "rms_x1e6", "n_frames")}
        for row in batch.to_pylist():
            samples = self._decode(row["clip_id"], row["payload"])
            out["clip_id"].append(row["clip_id"])
            out["duration_ms"].append(len(samples) * 1000 // 16000)
            out["rms_x1e6"].append(int(np.sqrt(np.mean(samples**2)) * 1e6))
            out["n_frames"].append(len(samples) // 256)
        return pa.Table.from_pydict(out, schema=AUDIO_FEATURES)


def video_frame_sample(*_a, **_k):
    """Video frame sampling stage — NOT IMPLEMENTED in this container (no
    video codec). The contract is VIDEO_FRAMES; the stage shape is identical
    to Thumbnailer (actor pool, small batches, binary in/out)."""
    raise NotImplementedError(
        "video decode requires a codec library not present in this container"
    )
