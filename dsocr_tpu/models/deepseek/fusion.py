"""Vision fusion: CLIP+SAM token concat, linear projection, and the
newline/view-separator token assembly.

Mirrors infer-deepseek/src/model/mod.rs:590-930: drop the CLIP CLS row,
concat CLIP (1024) + flattened SAM (1024) per token → linear projector to
n_embed; global tokens form a √S×√S grid with a learned `image_newline`
appended per row; local (crop) tokens are re-tiled into one big grid with
per-row newlines; a learned `view_seperator` separates views.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import DeepseekOcrConfig


def init_projector_params(
    cfg: DeepseekOcrConfig, key: jax.Array, dtype=jnp.bfloat16
) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    n = cfg.projector_n_embed
    i = cfg.projector_input_dim
    return {
        "weight": (jax.random.normal(k1, (i, n)) * (i**-0.5)).astype(dtype),
        "bias": jnp.zeros((n,), dtype),
        "image_newline": (jax.random.normal(k2, (n,)) * 0.02).astype(dtype),
        "view_seperator": (jax.random.normal(k3, (n,)) * 0.02).astype(dtype),
    }


def build_clip_sam_tokens(clip_out: jnp.ndarray, sam_out: jnp.ndarray) -> jnp.ndarray:
    """clip [B, 1+S, Hc] (CLS dropped) ++ sam [B, Cs, h, w] → [B, S, Hc+Cs]."""
    b, _, hc = clip_out.shape
    clip_tokens = clip_out[:, 1:]
    _, cs, h, w = sam_out.shape
    sam_tokens = sam_out.reshape(b, cs, h * w).transpose(0, 2, 1)
    return jnp.concatenate(
        [clip_tokens.astype(jnp.float32), sam_tokens.astype(jnp.float32)], axis=-1
    )


def project(params: Dict, tokens: jnp.ndarray) -> jnp.ndarray:
    out = jnp.einsum(
        "...i,io->...o",
        tokens.astype(jnp.float32),
        params["weight"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if params.get("bias") is not None:
        out = out + params["bias"].astype(jnp.float32)
    return out


def append_row_breaks(grid: jnp.ndarray, newline: jnp.ndarray) -> jnp.ndarray:
    """[rows, cols, H] → [rows*(cols+1), H] with newline after each row."""
    rows, cols, hidden = grid.shape
    nl = jnp.broadcast_to(newline.astype(grid.dtype)[None, None], (rows, 1, hidden))
    return jnp.concatenate([grid, nl], axis=1).reshape(rows * (cols + 1), hidden)


def format_global_tokens(projected: jnp.ndarray, newline: jnp.ndarray) -> jnp.ndarray:
    """[1, S, H] (S a perfect square) → grid + per-row newlines."""
    _, s, hidden = projected.shape
    side = int(round(s**0.5))
    assert side * side == s, f"global token count {s} is not a perfect square"
    return append_row_breaks(projected[0].reshape(side, side, hidden), newline)


def format_local_tokens(
    projected: jnp.ndarray,  # [patches, S, H]
    crop_shape: Tuple[int, int],  # (width_crops, height_crops)
    newline: jnp.ndarray,
) -> jnp.ndarray:
    patches, s, hidden = projected.shape
    width_crops, height_crops = crop_shape
    side = int(round(s**0.5))
    assert side * side == s
    grid = projected.reshape(height_crops, width_crops, side, side, hidden)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(
        height_crops * side, width_crops * side, hidden
    )
    return append_row_breaks(grid, newline)


def assemble_image_tokens(
    params: Dict,
    global_tokens: jnp.ndarray,
    local_tokens: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """[local?, global, view_seperator] (ref assemble_artifacts)."""
    segments = []
    if local_tokens is not None:
        segments.append(local_tokens)
    segments.append(global_tokens)
    segments.append(
        params["view_seperator"].astype(global_tokens.dtype)[None, :]
    )
    return jnp.concatenate(segments, axis=0)


def build_image_placeholders(
    image_token_id: int,
    crop_shape: Optional[Tuple[int, int]],
    base_size: int,
    image_size: int,
    crop_mode: bool,
    variant: str = "ocr1",
) -> list:
    """Host-side placeholder layout (ref model/mod.rs:2605-2689):
    PATCH=16, DOWNSAMPLE=4; OCR1 grids carry +1 per row and the global
    grid a trailing +1 (the view separator); OCR2 grids are flat."""
    PATCH, DOWN = 16, 4
    out: list = []

    def grid_with_breaks(rows, cols, terminal):
        for _ in range(rows):
            out.extend([image_token_id] * (cols + 1))
        if terminal:
            out.append(image_token_id)

    def grid_flat(rows, cols):
        out.extend([image_token_id] * (rows * cols))

    if crop_mode:
        import math

        nq_global = math.ceil((base_size // PATCH) / DOWN)
        nq_local = math.ceil((image_size // PATCH) / DOWN)
        width_crops, height_crops = crop_shape or (1, 1)
        if width_crops > 1 or height_crops > 1:
            rows = nq_local * height_crops
            cols = nq_local * width_crops
            if variant == "ocr1":
                grid_with_breaks(rows, cols, False)
            else:
                grid_flat(rows, cols)
        if variant == "ocr1":
            grid_with_breaks(nq_global, nq_global, True)
        else:
            grid_flat(nq_global, nq_global)
            out.append(image_token_id)
    else:
        import math

        nq = math.ceil((image_size // PATCH) / DOWN)
        if variant == "ocr1":
            grid_with_breaks(nq, nq, True)
        else:
            grid_flat(nq, nq)
            out.append(image_token_id)
    return out
