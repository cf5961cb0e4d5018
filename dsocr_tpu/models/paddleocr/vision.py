"""SigLIP vision tower (PaddleOCR-VL variant).

Structure mirrors infer-paddleocr/src/vision/encoder.rs: patch-embed as a
flattened linear, bilinear-interpolated position grid (the engine always
interpolates — model.rs:166), optional 2D rotary (use_3d_rope), N
pre-LayerNorm encoder layers with full bidirectional attention and
gelu-tanh MLPs, and a post layernorm. All norms/softmax are f32-stable.

Parameters are plain pytrees keyed like the HF checkpoint
(visual.vision_model.*) with weights pre-transposed to [in, out] for
row-major matmul on the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import attention, gelu_tanh, layer_norm, rotate_half
from .config import PaddleVisionConfig


def init_siglip_params(
    cfg: PaddleVisionConfig, key: jax.Array, dtype=jnp.bfloat16
) -> Dict:
    """Random-init parameter tree (tests / benches; real weights come from
    safetensors via the loader)."""
    keys = iter(jax.random.split(key, 16 + 16 * cfg.num_hidden_layers))
    patch_dim = cfg.num_channels * cfg.patch_size * cfg.patch_size
    h = cfg.hidden_size

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    params = {
        "patch_embed": lin(next(keys), patch_dim, h),
        "position_embedding": (
            jax.random.normal(next(keys), (cfg.base_grid * cfg.base_grid, h)) * 0.02
        ).astype(dtype),
        "post_layernorm": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "ln1": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
                "ln2": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
                "q": lin(next(keys), h, h),
                "k": lin(next(keys), h, h),
                "v": lin(next(keys), h, h),
                "o": lin(next(keys), h, h),
                "fc1": lin(next(keys), h, cfg.intermediate_size),
                "fc2": lin(next(keys), cfg.intermediate_size, h),
            }
        )
    return params


def _linear(x, p):
    out = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=jnp.float32)
    out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def interpolate_pos_grid(
    pos_embedding: jnp.ndarray,  # [base*base, H]
    base_grid: int,
    target_h: int,
    target_w: int,
) -> jnp.ndarray:
    """Bilinear resize of the learned position grid (align_corners=False
    pixel-center convention, ref encoder.rs:782-838)."""
    grid = pos_embedding.astype(jnp.float32).reshape(base_grid, base_grid, -1)

    def axis_coords(target, base):
        if base <= 1 or target <= 1:
            z = jnp.zeros((max(target, 1),), jnp.int32)
            return z, z, jnp.zeros((max(target, 1),), jnp.float32)
        scale = base / target
        real = (jnp.arange(target, dtype=jnp.float32) + 0.5) * scale - 0.5
        clamped = jnp.clip(real, 0.0, base - 1)
        low = jnp.floor(clamped).astype(jnp.int32)
        high = jnp.minimum(low + 1, base - 1)
        return low, high, clamped - low.astype(jnp.float32)

    y0, y1, fy = axis_coords(target_h, base_grid)
    x0, x1, fx = axis_coords(target_w, base_grid)
    rows = grid[y0] * (1 - fy)[:, None, None] + grid[y1] * fy[:, None, None]
    out = (
        rows[:, x0] * (1 - fx)[None, :, None] + rows[:, x1] * fx[None, :, None]
    )  # [th, tw, H]
    return out.reshape(target_h * target_w, -1).astype(pos_embedding.dtype)


def build_2d_rope(
    height_ids: jnp.ndarray,  # [N] int32
    width_ids: jnp.ndarray,  # [N] int32
    head_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D rotary (cos, sin) of shape [N, head_dim]: frequencies stride by 2
    over half the head dim; rows are [h-angles, w-angles] duplicated
    (ref encoder.rs:459-525)."""
    base_dim = max(head_dim // 2, 1)
    idx = np.arange(0, base_dim, 2, dtype=np.float32)
    inv_freq = jnp.asarray(1.0 / np.power(10000.0, idx / base_dim))
    if inv_freq.size == 0:
        inv_freq = jnp.ones((1,), jnp.float32)
    h_angles = height_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]
    w_angles = width_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]
    stacked = jnp.concatenate([h_angles, w_angles], axis=-1)  # [N, 2F]
    full = jnp.concatenate([stacked, stacked], axis=-1)  # [N, 4F] == head_dim
    return jnp.cos(full), jnp.sin(full)


def siglip_forward(
    params: Dict,
    cfg: PaddleVisionConfig,
    patches: jnp.ndarray,  # [N, C, p, p]
    grid_thw: Tuple[int, int, int],  # static
    height_ids: jnp.ndarray,  # [N] int32
    width_ids: jnp.ndarray,  # [N] int32
    use_rope: bool = True,
    valid: Optional[jnp.ndarray] = None,  # [N] bool — padding mask
) -> jnp.ndarray:
    """Returns [N, hidden] features (batch folded; images are packed by
    the caller)."""
    n = patches.shape[0]
    t, gh, gw = grid_thw
    flat = patches.reshape(n, -1)
    x = _linear(flat, params["patch_embed"])

    pos = interpolate_pos_grid(params["position_embedding"], cfg.base_grid, gh, gw)
    if t > 1:
        pos = jnp.tile(pos, (t, 1))
    if pos.shape[0] != n:  # padded patch slots reuse row 0 (masked anyway)
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[:1], (n - pos.shape[0], pos.shape[1]))]
        )
    x = (x.astype(jnp.float32) + pos.astype(jnp.float32)).astype(x.dtype)

    rope = None
    if use_rope:
        rope = build_2d_rope(height_ids, width_ids, cfg.head_dim)

    mask = None
    if valid is not None:
        mask = valid[None, None, None, :]  # broadcast [1,1,1,N]

    x = x[None]  # [1, N, H]
    for layer in params["layers"]:
        normed = layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], cfg.layer_norm_eps)
        q = _linear(normed, layer["q"]).reshape(1, n, cfg.num_attention_heads, -1)
        k = _linear(normed, layer["k"]).reshape(1, n, cfg.num_attention_heads, -1)
        v = _linear(normed, layer["v"]).reshape(1, n, cfg.num_attention_heads, -1)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        if rope is not None:
            cos, sin = rope
            q = _rope_apply(q, cos, sin)
            k = _rope_apply(k, cos, sin)
        attn = attention(q, k, v, mask=mask)
        attn = _linear(attn, layer["o"])
        x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)
        normed = layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], cfg.layer_norm_eps)
        h1 = gelu_tanh(_linear(normed, layer["fc1"]).astype(jnp.float32)).astype(x.dtype)
        h2 = _linear(h1, layer["fc2"])
        x = (x.astype(jnp.float32) + h2.astype(jnp.float32)).astype(x.dtype)

    x = layer_norm(
        x, params["post_layernorm"]["w"], params["post_layernorm"]["b"],
        cfg.layer_norm_eps,
    )
    return x[0]


def _rope_apply(x, cos, sin):
    x32 = x.astype(jnp.float32)
    c = cos[None, None].astype(jnp.float32)
    s = sin[None, None].astype(jnp.float32)
    return (x32 * c + rotate_half(x32) * s).astype(x.dtype)
