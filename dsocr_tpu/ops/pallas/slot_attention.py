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
- the grid is (B, n_blocks) and every block carries ALL KV heads: at
  the real model's geometry (10 KV heads, G=1) a per-head grid costs
  ~NKV x more sequential grid steps (~2-3 us each — measured 73.7
  ms/step vs the einsum's 15.4 at 16 rows x 27 layers) and NKV x
  smaller DMAs; the head loop unrolls INSIDE the kernel instead, so
  each grid step issues one [NKV, blk, D] DMA and NKV small dots.

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


def _online_softmax_head(
    h, q_ref, k_blk, v_blk, ks_row, vs_row, m_ref, l_ref, acc_ref,
    *, base_pos, n_pos, scale,
):
    """One KV head's flash-softmax block update (h is a static int).

    q_ref[0, h]: [G, D]; k_blk/v_blk: [blk, D]/[blk, Dv]; ks_row/vs_row:
    [blk] per-token scales or None; scratch rows m/l [NKV, G],
    acc [NKV, G, Dv]."""
    q = q_ref[0, h].astype(jnp.float32)  # [G, D]
    scores = jax.lax.dot_general(
        q, k_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # [G, blk]
    if ks_row is not None:
        scores = scores * ks_row[None, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base_pos
    scores = jnp.where(pos < n_pos, scores, jnp.float32(-1e30))

    m_prev = m_ref[h]  # [G]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1))
    alpha = jnp.exp(m_prev - m_new)  # [G]
    p = jnp.exp(scores - m_new[:, None])  # [G, blk]
    l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1)
    if vs_row is not None:
        p = p * vs_row[None, :]
    acc_ref[h] = acc_ref[h] * alpha[:, None] + jax.lax.dot_general(
        p, v_blk.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[h] = m_new


def _kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, NKV, G, D]
    k_ref,  # [1, 1, NKV, blk, D] codes or model dtype
    v_ref,  # [1, 1, NKV, blk, Dv]
    ks_ref,  # [1, 1, NKV, blk] f32 or None
    vs_ref,  # [1, 1, NKV, blk] f32 or None
    o_ref,  # [1, NKV, G, Dv]
    m_ref,  # scratch [NKV, G]
    l_ref,  # scratch [NKV, G]
    acc_ref,  # scratch [NKV, G, Dv]
    *,
    block: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_pos = lengths_ref[b] + 1  # attends [0, lengths[b]] inclusive
    last_blk = lengths_ref[b] // block
    nkv = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_blk)
    def _accumulate():
        for h in range(nkv):  # static unroll: all heads share the DMA
            _online_softmax_head(
                h, q_ref, k_ref[0, 0, h], v_ref[0, 0, h],
                ks_ref[0, 0, h] if ks_ref is not None else None,
                vs_ref[0, 0, h] if vs_ref is not None else None,
                m_ref, l_ref, acc_ref,
                base_pos=j * block, n_pos=n_pos, scale=scale,
            )

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[0] = acc_ref[...] / l_ref[...][..., None]


def _pick_block(S: int) -> int:
    for blk in (512, 256, 128):
        if S % blk == 0:
            return blk
    return S


def _kv_update_kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    k_ref,  # [1, 1, NKV, W, D] — the row's write window
    v_ref,  # [1, 1, NKV, W, Dv]
    ks_ref,  # [1, 1, NKV, W] or None
    vs_ref,  # [1, 1, NKV, W] or None
    kn_ref,  # [1, NKV, D] new token K
    vn_ref,  # [1, NKV, Dv]
    ksn_ref,  # [1, NKV] or None
    vsn_ref,  # [1, NKV] or None
    ko_ref,  # aliased outputs (same blocks as the k/v/ks/vs inputs)
    vo_ref,
    kso_ref,
    vso_ref,
    *,
    window: int,
):
    b = pl.program_id(0)
    off = lengths_ref[b] % window
    nkv = k_ref.shape[2]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nkv, window), 1) == off
    )  # [NKV, W]

    def _blend(dst_ref, win_ref, new_ref):
        # blend in f32 with a 3D iota mask: Mosaic can't insert a minor
        # dim on sub-32-bit types (int8 data, i1 masks) — and the
        # int8<->f32 round trip is exact
        win = win_ref[0, 0].astype(jnp.float32)
        new = new_ref[0].astype(jnp.float32)
        sel3 = (
            jax.lax.broadcasted_iota(jnp.int32, win.shape, 1) == off
        )  # [NKV, W, D]
        dst_ref[0, 0] = jnp.where(sel3, new[:, None, :], win).astype(
            dst_ref.dtype
        )

    _blend(ko_ref, k_ref, kn_ref)
    _blend(vo_ref, v_ref, vn_ref)
    if ks_ref is not None:
        # the new scales ride as ONE [B, NKV] block (a (1, NKV) block is
        # not a legal TPU tile — second-minor 1); select row b by mask
        row = jax.lax.broadcasted_iota(jnp.int32, ksn_ref.shape, 0) == b
        ksn = jnp.sum(jnp.where(row, ksn_ref[...], 0.0), axis=0)  # [NKV]
        vsn = jnp.sum(jnp.where(row, vsn_ref[...], 0.0), axis=0)
        kso_ref[0, 0] = jnp.where(sel, ksn[:, None], ks_ref[0, 0])
        vso_ref[0, 0] = jnp.where(sel, vsn[:, None], vs_ref[0, 0])


def _kv_update_kernel_no_scale(layer_ref, lengths_ref, k_ref, v_ref, kn_ref,
                               vn_ref, ko_ref, vo_ref, *, window):
    _kv_update_kernel(layer_ref, lengths_ref, k_ref, v_ref, None, None,
                      kn_ref, vn_ref, None, None, ko_ref, vo_ref, None, None,
                      window=window)


@functools.partial(jax.jit, static_argnames=("interpret",))
def slot_kv_update(
    k_all: jnp.ndarray,  # [L, B, NKV, S, D] (model dtype or int8 codes)
    v_all: jnp.ndarray,  # [L, B, NKV, S, Dv]
    ks_all: Optional[jnp.ndarray],  # [L, B, NKV, S] f32 or None
    vs_all: Optional[jnp.ndarray],
    k_new: jnp.ndarray,  # [B, NKV, D] — already quantized if the cache is
    v_new: jnp.ndarray,  # [B, NKV, Dv]
    ks_new: Optional[jnp.ndarray],  # [B, NKV] f32 or None
    vs_new: Optional[jnp.ndarray],
    layer: jnp.ndarray,  # scalar int32
    lengths: jnp.ndarray,  # [B] int32 write positions
    *,
    interpret: bool = False,
):
    """In-place (input_output_aliases) write of one new token per row at
    position lengths[r] of layer `layer`.

    The XLA scatter (`cache.at[li, rows, :, lengths, :].set(...)`) stops
    being in-place the moment a Pallas custom-call consumes the cache in
    the same scan body — XLA conservatively materializes a full copy of
    every [L, B, NKV, S, *] stack per LAYER (measured: 71 vs 14 ms/step
    at 16 rows x 12 layers x 2560 ctx). This kernel makes the write a
    Pallas call too, with the cache stacks explicitly aliased in/out, so
    the whole decode-step chain stays copy-free. Traffic per call is one
    [NKV, W, D] window per row (W = 128), ~KBs — not the full stack.

    Returns (k_all, v_all, ks_all, vs_all) with the same buffers updated.
    """
    L, B, NKV, S, D = k_all.shape
    Dv = v_all.shape[-1]
    W = 128 if S % 128 == 0 else _pick_block(S)
    quant = ks_all is not None

    def _win(b, lr, nr):
        return (lr[0], b, 0, nr[b] // W, 0)

    def _win_s(b, lr, nr):
        return (lr[0], b, 0, nr[b] // W)

    kv_specs = [
        pl.BlockSpec((1, 1, NKV, W, D), _win),
        pl.BlockSpec((1, 1, NKV, W, Dv), _win),
    ]
    new_specs = [
        pl.BlockSpec((1, NKV, D), lambda b, lr, nr: (b, 0, 0)),
        pl.BlockSpec((1, NKV, Dv), lambda b, lr, nr: (b, 0, 0)),
    ]
    if quant:
        B_, NKV_ = k_new.shape[0], NKV
        scale_spec = pl.BlockSpec((1, 1, NKV, W), _win_s)
        new_scale_spec = pl.BlockSpec(
            (B_, NKV_), lambda b, lr, nr: (0, 0)
        )
        in_specs = kv_specs + [scale_spec, scale_spec] + new_specs + [
            new_scale_spec, new_scale_spec,
        ]
        operands = [k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new, vs_new]
        out_specs = [kv_specs[0], kv_specs[1], scale_spec, scale_spec]
        out_shape = [
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
            jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
            jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
        ]
        # indices count the scalar-prefetch operands (layer, lengths)
        aliases = {2: 0, 3: 1, 4: 2, 5: 3}
        kernel = functools.partial(_kv_update_kernel, window=W)
    else:
        in_specs = kv_specs + new_specs
        operands = [k_all, v_all, k_new, v_new]
        out_specs = [kv_specs[0], kv_specs[1]]
        out_shape = [
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ]
        aliases = {2: 0, 3: 1}
        kernel = functools.partial(_kv_update_kernel_no_scale, window=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, lengths
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        lengths.astype(jnp.int32),
        *operands,
    )
    if quant:
        return out[0], out[1], out[2], out[3]
    return out[0], out[1], None, None


def slot_kv_update_auto(k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new,
                        vs_new, layer, lengths):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return slot_kv_update(
        k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new, vs_new, layer,
        lengths, interpret=jax.default_backend() != "tpu",
    )


def slot_kv_update_mesh(
    k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new, vs_new, layer,
    lengths, *, mesh, cache_replicated: bool = False,
):
    """shard_map wrapper for the in-place write under a mesh; the
    sharding layouts mirror slot_decode_attention_mesh exactly (the
    update must land on the same shards the attend reads). Returns None
    when the layout can't be expressed (caller falls back to the XLA
    scatter + einsum path)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape.get("mp", 1)
    dp = mesh.shape.get("dp", 1)
    B, NKV = k_new.shape[0], k_all.shape[2]
    interpret = jax.default_backend() != "tpu"
    quant = ks_all is not None
    if cache_replicated:
        h_axis = b_axis = None
    else:
        if dp > 1 and B % dp != 0:
            return None
        h_axis = "mp" if (mp > 1 and NKV % mp == 0) else None
        b_axis = "dp" if (dp > 1 and B % dp == 0) else None
        if h_axis is None and b_axis is None:
            return None
    kv_spec = P(None, b_axis, h_axis, None, None)
    scale_spec = P(None, b_axis, h_axis, None)
    new_spec = P(b_axis, h_axis, None)
    new_scale_spec = P(b_axis, h_axis)

    if quant:
        def per_shard(k_, v_, ks_, vs_, kn_, vn_, ksn_, vsn_, li_, lengths_):
            return slot_kv_update(
                k_, v_, ks_, vs_, kn_, vn_, ksn_, vsn_, li_, lengths_,
                interpret=interpret,
            )

        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(
                kv_spec, kv_spec, scale_spec, scale_spec,
                new_spec, new_spec, new_scale_spec, new_scale_spec,
                P(), P(b_axis),
            ),
            out_specs=(kv_spec, kv_spec, scale_spec, scale_spec),
            check_vma=False,
        )
        return fn(k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new,
                  vs_new, jnp.asarray(layer, jnp.int32), lengths)

    def per_shard_nq(k_, v_, kn_, vn_, li_, lengths_):
        k2, v2, _, _ = slot_kv_update(
            k_, v_, None, None, kn_, vn_, None, None, li_, lengths_,
            interpret=interpret,
        )
        return k2, v2

    fn_nq = shard_map(
        per_shard_nq,
        mesh=mesh,
        in_specs=(kv_spec, kv_spec, new_spec, new_spec, P(), P(b_axis)),
        out_specs=(kv_spec, kv_spec),
        check_vma=False,
    )
    k2, v2 = fn_nq(k_all, v_all, k_new, v_new,
                   jnp.asarray(layer, jnp.int32), lengths)
    return k2, v2, None, None


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

    def _clamped(b, j, lr, nr):
        # past-the-end ordinals re-read the row's last used block: Pallas
        # skips the DMA when consecutive steps map to the same block
        return (lr[0], b, 0, jnp.minimum(j, nr[b] // blk), 0)

    in_specs = [
        pl.BlockSpec((1, NKV, G, D), lambda b, j, lr, nr: (b, 0, 0, 0)),
        pl.BlockSpec((1, 1, NKV, blk, D), _clamped),
        pl.BlockSpec((1, 1, NKV, blk, Dv), _clamped),
    ]
    operands = [qg, k_all, v_all]
    if quant:
        scale_spec = pl.BlockSpec(
            (1, 1, NKV, blk),
            lambda b, j, lr, nr: (lr[0], b, 0, jnp.minimum(j, nr[b] // blk)),
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
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, NKV, G, Dv), lambda b, j, lr, nr: (b, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((NKV, G), jnp.float32),
            pltpu.VMEM((NKV, G), jnp.float32),
            pltpu.VMEM((NKV, G, Dv), jnp.float32),
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
