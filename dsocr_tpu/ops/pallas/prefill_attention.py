"""Pallas TPU kernel: decoder prefill attention (causal + left-pad mask).

The XLA fallback (ops/attention.py) materializes the full score tensor
[B, H, S, S_max] in f32 against the *entire* static KV buffer — at
S=2048, B=8, H=10 that is ~2.6 GB of HBM traffic per layer. During
prefill the cache is empty (every engine prefills into a fresh cache:
models/deepseek/engine.py _prefill_impl / prefill_for_slot, and the
no-cache variant re-feeds the whole context at start=0), so attention
only needs the *locally computed* K/V of the prompt itself. This kernel
keeps each query block's score rows in VMEM (K/V for one (batch, head)
fit comfortably at decoder sizes: S<=4096, D<=192 -> ~1.5 MB), applies
the causal + left-pad mask with iota comparisons, and reduces the
softmax over the full row — the S x S score tile never exists in HBM.

Reference precedent: the CUDA build runs flash-attn on exactly this
prefill path (infer-deepseek/src/transformer/block.rs:806-952); numerics
here mirror ops.attention (f32 scores, -1e30 mask fill, f32 softmax and
value accumulation).

GQA: queries [B, H, S, D] attend K/V [B, H_kv, S, D'] with the kv head
picked by block index map (h // (H // H_kv)) — no repeat_kv
materialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ps_ref, q_ref, k_ref, v_ref, o_ref, *, block_q: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(2)
    pad = ps_ref[b]

    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]  # [S, Dv]
    s = k.shape[0]
    bq = q.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)  # [bq, S]

    q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0) + i * block_q
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    mask = (kv_pos <= q_pos) & (kv_pos >= pad)
    scores = jnp.where(mask, scores, jnp.float32(-1e30))

    # fully masked rows (left-pad queries) degrade to uniform attention,
    # matching the XLA path's finite -1e30 fill (no NaNs).
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        probs, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret")
)
def flash_prefill_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,  # [B, H_kv, S, D] — the prompt's own K (NOT the cache)
    v: jnp.ndarray,  # [B, H_kv, S, Dv]
    pad_start: jnp.ndarray,  # [B] int32 left-pad boundary (zeros if unpadded)
    *,
    scale: float,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, S, H*Dv] in q.dtype (drop-in for ops.attention during
    prefill-from-empty-cache)."""
    B, H, S, D = q.shape
    H_kv = k.shape[1]
    Dv = v.shape[-1]
    assert H % H_kv == 0
    group = H // H_kv
    block_q = min(block_q, S)
    nq = pl.cdiv(S, block_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, ps: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i, ps: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, S, Dv), lambda b, h, i, ps: (b, h // group, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, Dv), lambda b, h, i, ps: (b, h, i, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_q=block_q, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dv), jnp.float32),
        interpret=interpret,
    )(pad_start.astype(jnp.int32), q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(B, S, H * Dv).astype(q.dtype)


def flash_prefill_attention_auto(q, k, v, pad_start=None, *, scale, mesh=None):
    """Pallas on TPU, interpreter elsewhere (CPU tests).

    Under a mesh the kernel runs per-shard via shard_map with heads
    sharded over mp (and batch over dp when divisible) — Pallas calls
    have no GSPMD partitioning rule, so without this every sharded
    prefill fell back to the XLA [B,H,S,S] f32-score path the kernel
    exists to kill. Falls back to replicated execution when the head
    counts don't divide the mesh."""
    if pad_start is None:
        pad_start = jnp.zeros((q.shape[0],), jnp.int32)
    interpret = jax.default_backend() != "tpu"
    if mesh is None:
        return flash_prefill_attention(
            q, k, v, pad_start, scale=scale, interpret=interpret
        )
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape.get("mp", 1)
    dp = mesh.shape.get("dp", 1)
    B, H = q.shape[0], q.shape[1]
    H_kv = k.shape[1]
    h_axis = "mp" if (mp > 1 and H % mp == 0 and H_kv % mp == 0) else None
    b_axis = "dp" if (dp > 1 and B % dp == 0) else None
    fn = shard_map(
        functools.partial(
            flash_prefill_attention, scale=scale, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(
            P(b_axis, h_axis, None, None),
            P(b_axis, h_axis, None, None),
            P(b_axis, h_axis, None, None),
            P(b_axis),
        ),
        # [B, S, H*Dv]: the flattened head dim stays sharded over mp —
        # exactly the layout o_proj (input dim over mp) consumes
        out_specs=P(b_axis, None, h_axis),
        check_vma=False,  # pallas out_shape carries no vma
    )
    return fn(q, k, v, pad_start)
