"""Pallas TPU kernel: fused decode attention over the contiguous slot KV.

The slot runtime's decode step attends one new token per row against that
row's cache slice [0, lengths[r]]. The XLA einsum path
(ops/attention.py attention_kv_int8 / attention) has two structural
costs on this op:

1. it streams the FULL [S_max] row per step — dead tail positions
   included (rows near the start of their budget read ~2x the bytes
   they need);
2. with an int8 cache the codes are converted to bf16/f32 feeding the
   dots, which XLA may materialize as full-row temporaries — paying the
   bandwidth the quantization was supposed to save.

This kernel walks the row in blocks with online (flash-style) softmax:

- the layer index and per-row lengths ride scalar prefetch; the whole
  [L, B, H_kv, S, D] stack is passed (never feed a lax dynamic-slice of
  a stacked buffer to a Pallas call — XLA materializes a per-layer
  copy; see LayeredQ8 / paged_attention.py);
- block ordinals past the row's last used block CLAMP to it, and Pallas
  skips the DMA when consecutive grid steps map to the same block —
  HBM traffic is ~proportional to lengths[r], not S_max;
- int8 codes are dequantized in VMEM: per-token k scales fold into the
  scores, v scales into the softmax weights (exactly
  attention_kv_int8's math, ops/attention.py:95-132);
- GQA computes all G = NH/NKV query heads of a KV head per block, so
  grouped caches are read once (the einsum path shares this property;
  the naive repeat_kv layout would not).

Semantics match deepseek_forward's slot mode (models/deepseek/
decoder.py:253-262): the new token's K/V is already written at
lengths[r]; the query attends kv positions <= lengths[r]. The reference
has no equivalent op (single-request growable cache,
core/src/cache.rs:340); this is the TPU serving hot loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_head_row(scales_blk, head):
    """[NKV, blk] -> [blk]: pick row `head` (a traced grid coordinate).

    Mosaic's tiling rule forbids a (1, blk) scale block over the
    [..., NKV, S] planes (second-minor block dim must divide 8 or equal
    NKV), so blocks carry ALL heads' scales and the kernel selects its
    row with an iota mask — a VPU-cheap reduction that always lowers,
    unlike a dynamic sublane slice."""
    row = jax.lax.broadcasted_iota(jnp.int32, scales_blk.shape, 0) == head
    return jnp.sum(jnp.where(row, scales_blk, 0.0), axis=0)


def _kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, 1, 1, blk, D] codes or model dtype
    v_ref,  # [1, 1, 1, blk, Dv]
    ks_ref,  # [1, 1, NKV, blk] f32 or None (all heads; see _select_head_row)
    vs_ref,  # [1, 1, NKV, blk] f32 or None
    o_ref,  # [1, 1, G, Dv]
    m_ref,  # scratch [1, G]
    l_ref,  # scratch [1, G]
    acc_ref,  # scratch [G, Dv]
    *,
    block: int,
    scale: float,
):
    b = pl.program_id(0)
    kv = pl.program_id(1)
    j = pl.program_id(2)
    n_pos = lengths_ref[b] + 1  # attends [0, lengths[b]] inclusive
    last_blk = lengths_ref[b] // block

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_blk)
    def _accumulate():
        q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
        k = k_ref[0, 0, 0].astype(jnp.float32)  # [blk, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # [G, blk]
        if ks_ref is not None:
            scores = scores * _select_head_row(ks_ref[0, 0], kv)[None, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block
        scores = jnp.where(pos < n_pos, scores, jnp.float32(-1e30))

        m_prev = m_ref[0]  # [G]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1))
        alpha = jnp.exp(m_prev - m_new)  # [G]
        p = jnp.exp(scores - m_new[:, None])  # [G, blk]
        l_ref[0] = l_ref[0] * alpha + jnp.sum(p, axis=1)
        if vs_ref is not None:
            p = p * _select_head_row(vs_ref[0, 0], kv)[None, :]
        acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
            p, v_ref[0, 0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0, 0] = acc_ref[...] / l_ref[0][:, None]


def _pick_block(S: int) -> int:
    for blk in (512, 256, 128):
        if S % blk == 0:
            return blk
    return S


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def slot_decode_attention(
    q: jnp.ndarray,  # [B, NH, 1, D] — one query token per row
    k_all: jnp.ndarray,  # [L, B, NKV, S, D] stack (model dtype or int8 codes)
    v_all: jnp.ndarray,  # [L, B, NKV, S, Dv]
    ks_all: Optional[jnp.ndarray],  # [L, B, NKV, S] f32 scales or None
    vs_all: Optional[jnp.ndarray],
    layer: jnp.ndarray,  # scalar int32
    lengths: jnp.ndarray,  # [B] int32 — new token already written at lengths[b]
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, 1, NH*Dv] in q.dtype (f32 accumulation inside)."""
    B, NH, Sq, D = q.shape
    assert Sq == 1, "slot decode is single-token"
    L, _, NKV, S, Dv = v_all.shape
    assert NH % NKV == 0
    G = NH // NKV  # q heads k*G..(k+1)*G share kv head k (repeat_kv order)
    blk = _pick_block(S)
    n_blocks = S // blk
    qg = q[:, :, 0, :].reshape(B, NKV, G, D)

    quant = ks_all is not None

    def _clamped(b, kv, j, lr, nr):
        # past-the-end ordinals re-read the row's last used block: Pallas
        # skips the DMA when consecutive steps map to the same block
        return (lr[0], b, kv, jnp.minimum(j, nr[b] // blk), 0)

    in_specs = [
        pl.BlockSpec((1, 1, G, D), lambda b, kv, j, lr, nr: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, 1, blk, D), _clamped),
        pl.BlockSpec((1, 1, 1, blk, Dv), _clamped),
    ]
    operands = [qg, k_all, v_all]
    if quant:
        # all NKV heads per block: a (1, blk) slice of the [L,B,NKV,S]
        # planes is not a legal TPU tile (second-minor dim 1 vs NKV);
        # the kernel masks out its head row (_select_head_row)
        scale_spec = pl.BlockSpec(
            (1, 1, NKV, blk),
            lambda b, kv, j, lr, nr: (lr[0], b, 0, jnp.minimum(j, nr[b] // blk)),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ks_all, vs_all]
        kernel = functools.partial(_kernel, block=blk, scale=scale)
    else:
        kernel = functools.partial(
            _no_scale_kernel, block=blk, scale=scale
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, lengths
        grid=(B, NKV, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, G, Dv), lambda b, kv, j, lr, nr: (b, kv, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((G, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NKV, G, Dv), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        lengths.astype(jnp.int32),
        *operands,
    )
    return out.reshape(B, 1, NH * Dv).astype(q.dtype)


def _no_scale_kernel(layer_ref, lengths_ref, q_ref, k_ref, v_ref, o_ref,
                     m_ref, l_ref, acc_ref, *, block, scale):
    _kernel(layer_ref, lengths_ref, q_ref, k_ref, v_ref, None, None, o_ref,
            m_ref, l_ref, acc_ref, block=block, scale=scale)


def slot_decode_attention_auto(
    q, k_all, v_all, ks_all, vs_all, layer, lengths, *, scale
):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return slot_decode_attention(
        q, k_all, v_all, ks_all, vs_all, layer, lengths, scale=scale,
        interpret=jax.default_backend() != "tpu",
    )


def slot_decode_attention_mesh(
    q, k_all, v_all, ks_all, vs_all, layer, lengths, *, scale, mesh,
    cache_replicated: bool = False,
):
    """shard_map wrapper for slot caches under a mesh: Pallas calls have
    no GSPMD partitioning rule, so without this every sharded slot
    decode fell back to the full-row einsum path.

    Two layouts: head-sharded caches (heads over mp, slots over dp —
    parallel/mesh.py cache_sharding) run the kernel per-shard;
    cache_replicated layouts (EP-quantized serving replicates
    attention/KV) run the full kernel redundantly on every shard — same
    math as replicated einsums, still skipping the dead row tails.
    Returns None when the layout can't be expressed without resharding
    the cache (caller falls back to the einsum path)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape.get("mp", 1)
    dp = mesh.shape.get("dp", 1)
    B, NH = q.shape[0], q.shape[1]
    NKV = k_all.shape[2]
    interpret = jax.default_backend() != "tpu"
    quant = ks_all is not None
    if cache_replicated:
        h_axis = b_axis = None
    else:
        if dp > 1 and B % dp != 0:
            # cache_sharding still shards B over dp in this case;
            # demanding replication here would all-gather the KV stacks
            # inside every decode step — not worth the kernel
            return None
        h_axis = "mp" if (mp > 1 and NH % mp == 0 and NKV % mp == 0) else None
        b_axis = "dp" if (dp > 1 and B % dp == 0) else None
        if h_axis is None and b_axis is None:
            return None
    kv_spec = P(None, b_axis, h_axis, None, None)
    scale_spec = P(None, b_axis, h_axis, None)

    def per_shard(q_, k_, v_, ks_, vs_, li_, lengths_):
        return slot_decode_attention(
            q_, k_, v_, ks_ if quant else None, vs_ if quant else None,
            li_, lengths_, scale=scale, interpret=interpret,
        )

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(b_axis, h_axis, None, None),
            kv_spec,
            kv_spec,
            scale_spec if quant else P(),
            scale_spec if quant else P(),
            P(),
            P(b_axis),
        ),
        # [B, 1, NH*Dv]: the flattened head dim stays sharded over mp —
        # the layout o_proj (input dim over mp) consumes
        out_specs=P(b_axis, None, h_axis),
        check_vma=False,  # pallas out_shape carries no vma
    )
    zero = jnp.zeros((), jnp.float32)
    return fn(
        q, k_all, v_all,
        ks_all if quant else zero,
        vs_all if quant else zero,
        jnp.asarray(layer, jnp.int32),
        lengths,
    )
