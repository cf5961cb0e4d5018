"""Scaled dot-product attention with GQA and static-cache masking.

Numerics follow the reference's hardened path (block.rs:662-775): score
matmul and softmax in f32 when the working dtype is low precision, value
accumulation in f32. On TPU this is one fused einsum→softmax→einsum; XLA
handles the fusion, and the static KV buffer + length mask replaces the
reference's concat-of-chunks cache views.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def repeat_kv(x: jnp.ndarray, repeats: int) -> jnp.ndarray:
    """[B, H_kv, S, D] → [B, H_kv*repeats, S, D] (GQA head expansion)."""
    if repeats == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, repeats, s, d)).reshape(
        b, h * repeats, s, d
    )


def causal_mask(q_len: int, kv_len: int, q_offset) -> jnp.ndarray:
    """[q_len, kv_len] bool mask: True where query position (q_offset + i)
    may attend to kv position j (j <= q_offset + i). `q_offset` may be a
    traced scalar (the current cache length during decode)."""
    q_pos = jnp.arange(q_len, dtype=jnp.int32)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
    return kv_pos <= q_pos


def attention(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H_kv, Skv, D]
    v: jnp.ndarray,  # [B, H_kv, Skv, Dv]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Sq, Skv], bool
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns [B, Sq, H*Dv]. Scores/softmax in f32; output in q.dtype."""
    dtype = q.dtype
    num_heads = q.shape[1]
    num_kv_heads = k.shape[1]
    if num_kv_heads != num_heads:
        assert num_heads % num_kv_heads == 0
        k = repeat_kv(k, num_heads // num_kv_heads)
        v = repeat_kv(v, num_heads // num_kv_heads)

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    b, h, sq, dv = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, sq, h * dv).astype(dtype)
