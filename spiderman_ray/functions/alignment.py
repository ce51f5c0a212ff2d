"""Deterministic CLIP-stub caption<->image alignment scoring.

A real system loads a CLIP-family dual encoder once per actor (in the
pool stage's ``__init__``) and scores cosine(image_emb, caption_emb) per
batch; this container ships no model weights and no GPU, so the two
encoders are STUBBED with deterministic feature extractors sharing one
48-dim space:

- image side: 4x4 grid of per-channel pixel box-means (the shared
  summed-area-table resize in functions/imaging.py), scaled to [0, 1]
- caption side: signed feature hashing of the caption tokens (md5-based
  ``hash64`` -> bucket = h mod 48, sign = top bit), the ``hash_embed``
  family's kernel

Both encoders and the cosine run in float32 end to end, and the score is
integerized floor(cos * 1e6). Engine and oracle share THESE functions,
so parity is structural (the float-kernel invariant: never optimize one
side alone). The stub is NOT a semantic model — it pins the plumbing
contract (schema, batching, actor signature, integerization) that a real
dual encoder drops into with a one-line ``__init__`` swap.
"""

from __future__ import annotations

import math

import numpy as np

from spiderman_ray.functions.hashing import hash64
from spiderman_ray.functions.imaging import box_resize

#: Dimensionality of the shared embedding space (16 cells x 3 channels).
D_ALIGN = 48


def _l2norm32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.float32, copy=False)
    n = np.float32(np.sqrt(np.float32(np.dot(v, v))))
    return v if n == 0 else (v / n).astype(np.float32)


def image_embed(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 pixels -> L2-normalized float32 (48,) grid-mean
    embedding. Deterministic; no model state."""
    grid = box_resize(px, 4, 4)  # (4, 4, 3) box means, float64
    return _l2norm32((grid.astype(np.float32) / np.float32(255.0)).reshape(-1))


def caption_embed(caption: str) -> np.ndarray:
    """Caption text -> L2-normalized float32 (48,) signed feature-hash
    embedding (bucket = hash64(token) mod 48, sign = top hash bit).
    Empty captions embed to the zero vector."""
    toks = [t for t in caption.split(" ") if t]
    v = np.zeros(D_ALIGN, dtype=np.float32)
    if not toks:
        return v
    h = hash64(toks).view(np.uint64)
    bucket = (h % np.uint64(D_ALIGN)).astype(np.int64)
    sign = np.where((h >> np.uint64(63)).astype(bool), np.float32(-1), np.float32(1))
    np.add.at(v, bucket, sign)
    return _l2norm32(v)


def align_score_x1e6(px: np.ndarray, caption: str) -> int:
    """floor(cosine(image_embed, caption_embed) * 1e6) as int64-safe int.
    One float32 dot product, one float64 scale — the single-IEEE-op
    integerization contract shared by the engine stage and the oracle's
    sequential recompute."""
    cos = np.float32(np.dot(image_embed(px), caption_embed(caption)))
    return int(math.floor(float(cos) * 1e6))
