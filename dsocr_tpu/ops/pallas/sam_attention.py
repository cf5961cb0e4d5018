"""Pallas TPU kernel: SAM global attention with decomposed rel-pos bias.

The reference (and the XLA fallback in models/deepseek/sam.py) computes
``softmax(q·kᵀ·scale + bias_h ⊕ bias_w) · v`` with the broadcast-sum
bias materialized as a full [B, heads, S, S] f32 tensor
(sam.rs:1124-1196 builds it with a host loop). At S=4096 that is 1.5 GB
of HBM traffic per global layer. This kernel never materializes any
S×S tensor in HBM: for each query block it keeps the score rows in
VMEM, reconstructs the bias tile from the small decomposed precursors

    bias[i, j] = bias_h[i, j // W] + bias_w[i, j mod W]

via two one-hot expansion matmuls (iota-comparison 0/1 matrices hit the
MXU; Mosaic rejects lane-dim gathers), and reduces the softmax over the
full row — K/V for one (batch, head) fit VMEM at SAM sizes (S ≤ 4096,
head_dim 64 → 2 MB), so no online-softmax carry is needed.

Inputs fold (batch, heads) into one leading dim:
  q, k, v  : [BH, S, D]   (q pre-scaled by the caller)
  bias_h   : [BH, S, H']  where H' = grid height (kh) — q·rel_pos_h
  bias_w   : [BH, S, W']  where W' = grid width  (kw) — q·rel_pos_w
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *, width: int):
    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]  # [S, D]
    bh = bh_ref[0]  # [bq, H']
    bw = bw_ref[0]  # [bq, W']
    s = k.shape[0]
    kh = bh.shape[-1]
    kw = bw.shape[-1]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S]

    # one-hot expansion: Eh[h, j] = (h == j // W), Ew[w, j] = (w == j % W)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (kh, s), 1) // width
    row_h = jax.lax.broadcasted_iota(jnp.int32, (kh, s), 0)
    eh = (row_h == col_h).astype(jnp.float32)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (kw, s), 1) % width
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, s), 0)
    ew = (row_w == col_w).astype(jnp.float32)

    scores = scores + jax.lax.dot_general(
        bh.astype(jnp.float32), eh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores + jax.lax.dot_general(
        bw.astype(jnp.float32), ew, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        probs, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("width", "block_q", "interpret"))
def sam_flash_attention(
    q: jnp.ndarray,  # [BH, S, D] — already scaled by head_dim**-0.5
    k: jnp.ndarray,  # [BH, S, D]
    v: jnp.ndarray,  # [BH, S, D]
    bias_h: jnp.ndarray,  # [BH, S, H']
    bias_w: jnp.ndarray,  # [BH, S, W']
    *,
    width: int,
    block_q: int = 128,  # 256 exceeds the 16M VMEM scoped limit at S=4096
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [BH, S, D] f32 attention output."""
    bh_dim, s, d = q.shape
    block_q = min(block_q, s)
    nq = pl.cdiv(s, block_q)
    grid = (bh_dim, nq)
    kh = bias_h.shape[-1]
    kw = bias_w.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, kh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, kw), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_dim, s, d), jnp.float32),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w)
