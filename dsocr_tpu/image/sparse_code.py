"""Sparse document coding for pixel uploads.

Document pages are background-dominated: on the reference benchmark page
(/root/reference/assets/sample_1.png) ~77% of tile pixels equal the page
background color after preprocessing. Serving on this machine is LINK-
bound (r4 attribution: pixel upload is 357 ms/page — 85% of the tower
wall — on a ~40 MB/s tunneled host↔device link), so shipping a per-pixel
background bitmask plus only the non-background pixel values cuts the
bytes ~2-4x on real pages and flips the pipeline back to compute-bound.

Encoding (host, numpy): per-view modal color `bg` → bitmask of pixels
differing from it (packed 8/byte) → exception values [K, 3] (K padded to
a power-of-2 bucket so the device decoder compiles O(log N) graphs, not
one per page). Decoding (device, one small jit): unpack bits, prefix-sum
to index the exception list, select. Integer-only — the decoded tensor
is BIT-EXACT equal to the raw upload, so tower numerics are unchanged
(unlike the content-slice upload's pad-fusion ~2e-5, this path is
exact). Pages that aren't background-dominated (photos, noise) fall back
to the raw upload via the `None` return.

No reference analogue: the reference runs host-local (no transfer
bottleneck, crates/infer-deepseek reads pixels in-process); this is
TPU-serving-specific transport compression.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SparseViews:
    """Host-side encoded pixel chunk (see module docstring)."""

    shape: Tuple[int, int, int, int]  # (B, 3, H, W) of the decoded chunk
    mask_bits: np.ndarray  # uint8 [ceil(B*H*W/8)] packed row-major (b,h,w)
    values: np.ndarray  # uint8 [K_pad, 3] exception pixels, zero-padded
    n_values: int  # true K before bucket padding
    bg: np.ndarray  # uint8 [B, 3] per-view background color

    @property
    def nbytes(self) -> int:
        return self.mask_bits.nbytes + self.values.nbytes + self.bg.nbytes


def estimate_bg(chunk: np.ndarray) -> np.ndarray:
    """Per-view modal color from an 8x8 subsample — [B, 3] uint8.

    The background choice only affects the compression ratio, never
    correctness (every non-bg pixel ships verbatim), so a subsample mode
    is enough and keeps host cost ~free."""
    sub = chunk[:, :, ::8, ::8]
    B = chunk.shape[0]
    bg = np.empty((B, 3), np.uint8)
    for b in range(B):
        px = sub[b].reshape(3, -1).astype(np.int32)
        code = (px[0] << 16) | (px[1] << 8) | px[2]
        vals, counts = np.unique(code, return_counts=True)
        m = int(vals[counts.argmax()])
        bg[b] = ((m >> 16) & 255, (m >> 8) & 255, m & 255)
    return bg


def bucket_k(k: int, minimum: int = 1024) -> int:
    """Quarter-octave bucket for the exception count: ≤4 decode compile
    keys per power of two while capping zero-padding waste at ~3%."""
    if k <= minimum:
        return minimum
    step = max((1 << (k.bit_length() - 1)) // 4, 1)
    return -(-k // step) * step


def encode_views(
    chunk: np.ndarray, max_ratio: float = 0.5, min_bucket: int = 1024
) -> Optional[SparseViews]:
    """Encode a [B, 3, H, W] uint8 view chunk; None when the encoded
    size would exceed `max_ratio` of the raw bytes (upload raw then —
    the host encode work wouldn't buy enough link time)."""
    B, C, H, W = chunk.shape
    assert C == 3, chunk.shape
    bg = estimate_bg(chunk)
    mask = (chunk != bg[:, :, None, None]).any(axis=1)  # [B, H, W]
    K = int(mask.sum())
    N = B * H * W
    if (N // 8 + 3 * K) >= max_ratio * 3 * N:
        return None
    # [K, 3] exceptions in (b,h,w) order; per-channel boolean selects on
    # contiguous planes are ~5-10x faster than fancy-indexing the
    # transposed chunk (measured 10 vs 46-100 ms on a 20 MB chunk)
    m = mask.reshape(B, -1)
    values = np.stack(
        [chunk[:, c].reshape(B, -1)[m] for c in range(C)], axis=1
    )
    k_pad = bucket_k(K, min_bucket)
    if k_pad > K:
        values = np.concatenate(
            [values, np.zeros((k_pad - K, 3), np.uint8)], axis=0
        )
    return SparseViews(
        (B, C, H, W), np.packbits(mask.reshape(-1)), values, K, bg
    )


def decode_views(mask_bits, values, bg, *, shape):
    """Jittable inverse of encode_views → uint8 [B, 3, H, W].

    Integer-only (unpack via shifts, int32 prefix sum, gather, select):
    bit-exact vs the original chunk. `shape` is static; compile keys are
    (chunk shape, K bucket) — both already bucketed by the callers."""
    import jax.numpy as jnp

    B, C, H, W = shape
    N = B * H * W
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits is MSB-first
    bits = ((mask_bits[:, None] >> shifts) & jnp.uint8(1)).reshape(-1)[:N]
    on = bits.astype(bool)
    idx = jnp.clip(
        jnp.cumsum(bits.astype(jnp.int32)) - 1, 0, values.shape[0] - 1
    )
    gathered = values[idx]  # [N, 3]
    bg_px = jnp.broadcast_to(bg[:, None, None, :], (B, H, W, 3)).reshape(N, 3)
    out = jnp.where(on[:, None], gathered, bg_px)
    return out.reshape(B, H, W, C).transpose(0, 3, 1, 2)
