"""Rotary position embeddings.

Table construction mirrors infer-deepseek/src/transformer/rope.rs:173-207
(inv_freq = theta^(-2i/d), duplicated half tables); application mirrors
block.rs apply_rope:1403-1426 including the DeepSeek-MLA even/odd
regrouping. Tables are precomputed to a static max length (TPU wants
static shapes; the reference grows them geometrically instead).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def build_rope_tables(
    max_len: int, rope_dim: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [max_len, rope_dim] in f32.

    Layout is [cos(p·f_0..f_{d/2-1}), cos(p·f_0..f_{d/2-1})] (two copies of
    the half-frequency table), the HF/reference convention paired with
    rotate_half.
    """
    assert rope_dim % 2 == 0, f"rope dimension must be even (got {rope_dim})"
    half = rope_dim // 2
    exponents = jnp.arange(half, dtype=jnp.float32) * 2.0 / rope_dim
    inv_freq = 1.0 / jnp.power(jnp.float32(theta), exponents)
    positions = jnp.arange(max_len, dtype=jnp.float32)
    angles = positions[:, None] * inv_freq[None, :]
    cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)
    return cos, sin


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def mla_interleave_regroup(x: jnp.ndarray) -> jnp.ndarray:
    """DeepSeek-MLA regrouping before rotate_half: interpret the last dim
    as interleaved (even, odd) pairs and regroup to [evens..., odds...]
    (block.rs:1403-1426)."""
    *lead, d = x.shape
    return (
        x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)
    )


def apply_rope(
    x: jnp.ndarray,  # [..., seq, rope_dim]
    cos: jnp.ndarray,  # [seq, rope_dim] or broadcastable
    sin: jnp.ndarray,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Apply rotary embedding in f32, cast back to x.dtype."""
    dtype = x.dtype
    if interleaved:
        x = mla_interleave_regroup(x)
    x32 = x.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    out = x32 * cos + rotate_half(x32) * sin
    return out.astype(dtype)
