"""CLIP-L tower consuming SAM features as patch embeddings.

Mirrors infer-deepseek/src/vision/clip.rs: class token + position
embedding (grid part antialias-bicubic-resized when the token count
differs from 224/14), pre-layernorm, 24 pre-LN blocks with fused-qkv
attention and quick-gelu MLPs. Output keeps the CLS row; the fusion step
drops it.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...ops import quick_gelu
from .config import ClipParams
from .sam import _layer_norm, _linear


def init_clip_params(p: ClipParams, key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 4 + 6 * p.num_layers))
    H = p.hidden_size

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    params = {
        "class_embedding": (jax.random.normal(next(keys), (H,)) * 0.02).astype(dtype),
        "position_embedding": (
            jax.random.normal(next(keys), (p.seq_length + 1, H)) * 0.02
        ).astype(dtype),
        "pre_layernorm": {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
        "layers": [],
    }
    for _ in range(p.num_layers):
        params["layers"].append(
            {
                "ln1": {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
                "ln2": {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
                "qkv": lin(next(keys), H, 3 * H),
                "out": lin(next(keys), H, H),
                "fc1": lin(next(keys), H, p.ffn_hidden_size),
                "fc2": lin(next(keys), p.ffn_hidden_size, H),
            }
        )
    return params


def _adapt_position_embedding(pos: jnp.ndarray, target_tokens: int) -> jnp.ndarray:
    """Resize the grid part of [1+S, H] to 1+target (CLS row kept)."""
    total, hidden = pos.shape
    if total == target_tokens:
        return pos
    cls_row = pos[:1]
    grid = pos[1:]
    src_side = int(round((total - 1) ** 0.5))
    dst_side = int(round((target_tokens - 1) ** 0.5))
    grid = grid.astype(jnp.float32).reshape(1, src_side, src_side, hidden)
    resized = jax.image.resize(
        grid, (1, dst_side, dst_side, hidden), method="bicubic", antialias=True
    )
    return jnp.concatenate(
        [cls_row.astype(jnp.float32), resized.reshape(dst_side * dst_side, hidden)]
    )


def clip_forward(
    params: Dict,
    p: ClipParams,
    patch_embeds: jnp.ndarray,  # [B, hidden, grid, grid] (SAM output)
) -> jnp.ndarray:
    """Returns [B, 1 + grid², hidden]."""
    b, hidden, gh, gw = patch_embeds.shape
    n = gh * gw
    patches = patch_embeds.reshape(b, hidden, n).transpose(0, 2, 1).astype(jnp.float32)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(jnp.float32)[None, None], (b, 1, hidden)
    )
    tokens = jnp.concatenate([cls, patches], axis=1)
    pos = _adapt_position_embedding(params["position_embedding"], n + 1)
    x = tokens + pos[None]

    x = _layer_norm(
        x, params["pre_layernorm"]["w"], params["pre_layernorm"]["b"],
        p.layernorm_epsilon,
    )
    num_heads = p.num_heads
    head_dim = hidden // num_heads
    s = n + 1
    for layer in params["layers"]:
        normed = _layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], p.layernorm_epsilon)
        qkv = _linear(normed, layer["qkv"])
        q, k, v = (
            qkv[..., i * hidden : (i + 1) * hidden]
            .reshape(b, s, num_heads, head_dim)
            .transpose(0, 2, 1, 3)
            for i in range(3)
        )
        # ref CLIP attention runs entirely in weight dtype
        # (clip.rs:449-453 — no f32 upcast); softmax in f32 for stability,
        # probs stored back in weight dtype for the value matmul.
        scores = jnp.einsum(
            "bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, hidden)
        x = x + _linear(ctx, layer["out"])
        normed = _layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], p.layernorm_epsilon)
        x = x + _linear(quick_gelu(_linear(normed, layer["fc1"])), layer["fc2"])
    return x
