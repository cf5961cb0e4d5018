"""Pallas TPU kernel: paged decode attention over a shared KV page pool.

The slot runtime's contiguous cache reserves a worst-case [S_max] row
per slot and the decode step streams the WHOLE row every token (dead
positions included). With paging, each slot owns an ordered list of
fixed-size pages from a shared pool ([L, P, H_kv, page, D]) and this
kernel walks only the pages a row actually uses:

- the page table and per-row lengths ride scalar prefetch;
- the page-block index map CLAMPS out-of-range page ordinals to the
  row's last used page — Pallas skips the DMA when consecutive grid
  steps map to the same block, so HBM traffic is ~proportional to used
  tokens, not to the table capacity;
- softmax is accumulated online (flash-style scratch: running max,
  denominator, weighted value sum) across the page walk;
- the grid is (B, P_max) and every page block carries ALL KV heads,
  with the head loop unrolled inside the kernel (one [NKV, page, D]
  DMA per step) — a per-head grid dimension costs ~NKV x more
  sequential grid steps and NKV x smaller DMAs (slot_attention.py
  docstring has the measured numbers).

The whole [L, ...] pool is passed and the layer index rides scalar
prefetch — never feed a lax dynamic-slice of a stacked buffer into a
Pallas call (XLA materializes a full per-layer copy; see LayeredQ8).

Reference analogue: growable KV chunks (core/src/cache.rs:15,340); the
north star names a paged cache (BASELINE.json). Semantics match the
contiguous slot decode: the new token's K/V is already written at
position lengths[r], and the query attends [0, lengths[r]] inclusive.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slot_attention import _online_softmax_head


def _kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    tables_ref,  # [B, P_max] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, H_kv, G, D] — the row's full query block
    k_ref,  # [1, 1, H_kv, page, D] model dtype or int8 codes
    v_ref,  # [1, 1, H_kv, page, Dv]
    ks_ref,  # [1, 1, H_kv, page] f32 per-token scales or None
    vs_ref,  # [1, 1, H_kv, page] f32 or None
    o_ref,  # [1, H_kv, G, Dv]
    m_ref,  # scratch [H_kv, G]
    l_ref,  # scratch [H_kv, G]
    acc_ref,  # scratch [H_kv, G, Dv]
    *,
    page: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_pos = lengths_ref[b] + 1  # attends [0, lengths[b]] inclusive
    last_page = (n_pos - 1) // page
    nkv = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_page)
    def _accumulate():
        for h in range(nkv):  # static unroll: all heads share the DMA
            _online_softmax_head(
                h, q_ref, k_ref[0, 0, h], v_ref[0, 0, h],
                ks_ref[0, 0, h] if ks_ref is not None else None,
                vs_ref[0, 0, h] if vs_ref is not None else None,
                m_ref, l_ref, acc_ref,
                base_pos=j * page, n_pos=n_pos, scale=scale,
            )

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[0] = acc_ref[...] / l_ref[...][..., None]


def _no_scale_kernel(layer_ref, tables_ref, lengths_ref, q_ref, k_ref, v_ref,
                     o_ref, m_ref, l_ref, acc_ref, *, page, scale):
    _kernel(layer_ref, tables_ref, lengths_ref, q_ref, k_ref, v_ref, None,
            None, o_ref, m_ref, l_ref, acc_ref, page=page, scale=scale)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, H, D] — one query token per row
    k_pool: jnp.ndarray,  # [L, P, H_kv, page, D] model dtype or int8 codes
    v_pool: jnp.ndarray,  # [L, P, H_kv, page, Dv]
    page_tables: jnp.ndarray,  # [B, P_max] int32 pool page ids
    lengths: jnp.ndarray,  # [B] int32 — new token already written at lengths[b]
    layer: jnp.ndarray,  # scalar int32
    *,
    scale: float,
    ks_pool: Optional[jnp.ndarray] = None,  # [L, P, H_kv, page] f32 scales
    vs_pool: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H*Dv] f32."""
    B, H, D = q.shape
    L, P, H_kv, page, Dv = v_pool.shape
    assert H % H_kv == 0
    G = H // H_kv  # q heads k*G..(k+1)*G share kv head k (repeat_kv order)
    P_max = page_tables.shape[1]
    quant = ks_pool is not None
    qg = q.reshape(B, H_kv, G, D)

    def _pool_idx(b, j, lr, tr, nr):
        # clamp past-the-end ordinals to the row's last used page:
        # consecutive identical blocks skip the DMA
        return (lr[0], tr[b, jnp.minimum(j, nr[b] // page)], 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, H_kv, G, D), lambda b, j, lr, tr, nr: (b, 0, 0, 0)),
        pl.BlockSpec((1, 1, H_kv, page, D), _pool_idx),
        pl.BlockSpec((1, 1, H_kv, page, Dv), _pool_idx),
    ]
    operands = [qg, k_pool, v_pool]
    if quant:
        scale_spec = pl.BlockSpec(
            (1, 1, H_kv, page),
            lambda b, j, lr, tr, nr: (
                lr[0], tr[b, jnp.minimum(j, nr[b] // page)], 0, 0
            ),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ks_pool, vs_pool]
        kernel = functools.partial(_kernel, page=page, scale=scale)
    else:
        kernel = functools.partial(_no_scale_kernel, page=page, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, tables, lengths
        grid=(B, P_max),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, H_kv, G, Dv), lambda b, j, lr, tr, nr: (b, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((H_kv, G), jnp.float32),
            pltpu.VMEM((H_kv, G), jnp.float32),
            pltpu.VMEM((H_kv, G, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H_kv, G, Dv), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        page_tables.astype(jnp.int32),
        lengths.astype(jnp.int32),
        qg,
        # pools passed whole; layer selection happens in the index maps
        *operands[1:],
    )
    return out.reshape(B, H * Dv)


def _paged_update_kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    tables_ref,  # [B, P_max] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    k_ref,  # [1, 1, H_kv, W, D] — the row's write window of its page
    v_ref,  # [1, 1, H_kv, W, Dv]
    ks_ref,  # [1, 1, H_kv, W] or None
    vs_ref,  # [1, 1, H_kv, W] or None
    kn_ref,  # [1, H_kv, D]
    vn_ref,  # [1, H_kv, Dv]
    ksn_ref,  # [1, H_kv] or None
    vsn_ref,  # [1, H_kv] or None
    ko_ref,  # aliased outputs
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
    )  # [H_kv, W]
    def _blend(dst_ref, win_ref, new_ref):
        # blend in f32 with a 3D iota mask: Mosaic can't insert a minor
        # dim on sub-32-bit types (int8 data, i1 masks) — and the
        # int8<->f32 round trip is exact
        win = win_ref[0, 0].astype(jnp.float32)
        new = new_ref[0].astype(jnp.float32)
        sel3 = (
            jax.lax.broadcasted_iota(jnp.int32, win.shape, 1) == off
        )  # [H_kv, W, D]
        dst_ref[0, 0] = jnp.where(sel3, new[:, None, :], win).astype(
            dst_ref.dtype
        )

    _blend(ko_ref, k_ref, kn_ref)
    _blend(vo_ref, v_ref, vn_ref)
    if ks_ref is not None:
        # new scales ride as ONE [B, H_kv] block (a (1, H_kv) block is
        # not a legal TPU tile — second-minor 1); select row b by mask
        row = jax.lax.broadcasted_iota(jnp.int32, ksn_ref.shape, 0) == b
        ksn = jnp.sum(jnp.where(row, ksn_ref[...], 0.0), axis=0)  # [H_kv]
        vsn = jnp.sum(jnp.where(row, vsn_ref[...], 0.0), axis=0)
        kso_ref[0, 0] = jnp.where(sel, ksn[:, None], ks_ref[0, 0])
        vso_ref[0, 0] = jnp.where(sel, vsn[:, None], vs_ref[0, 0])


def _paged_update_kernel_no_scale(layer_ref, tables_ref, lengths_ref, k_ref,
                                  v_ref, kn_ref, vn_ref, ko_ref, vo_ref, *,
                                  window):
    _paged_update_kernel(layer_ref, tables_ref, lengths_ref, k_ref, v_ref,
                         None, None, kn_ref, vn_ref, None, None, ko_ref,
                         vo_ref, None, None, window=window)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_update(
    k_pool: jnp.ndarray,  # [L, P, H_kv, page, D]
    v_pool: jnp.ndarray,  # [L, P, H_kv, page, Dv]
    ks_pool: Optional[jnp.ndarray],  # [L, P, H_kv, page] f32 or None
    vs_pool: Optional[jnp.ndarray],
    k_new: jnp.ndarray,  # [B, H_kv, D] — already int8 codes if pool is
    v_new: jnp.ndarray,
    ks_new: Optional[jnp.ndarray],  # [B, H_kv] f32 or None
    vs_new: Optional[jnp.ndarray],
    page_tables: jnp.ndarray,  # [B, P_max] int32
    lengths: jnp.ndarray,  # [B] int32 write positions
    layer: jnp.ndarray,  # scalar int32
    *,
    interpret: bool = False,
):
    """In-place (input_output_aliases) write of one new token per row
    into its page-table slot at position lengths[r]. Same rationale as
    slot_kv_update (slot_attention.py): an XLA scatter whose result
    feeds a Pallas attend forces a full pool copy per layer; the aliased
    kernel touches one [H_kv, W, D] window of one page per row."""
    L, P, H_kv, page, D = k_pool.shape
    Dv = v_pool.shape[-1]
    W = 128 if page % 128 == 0 else page
    quant = ks_pool is not None

    def _win(b, lr, tr, nr):
        pos = nr[b]
        return (lr[0], tr[b, pos // page], 0, (pos % page) // W, 0)

    def _win_s(b, lr, tr, nr):
        pos = nr[b]
        return (lr[0], tr[b, pos // page], 0, (pos % page) // W)

    kv_specs = [
        pl.BlockSpec((1, 1, H_kv, W, D), _win),
        pl.BlockSpec((1, 1, H_kv, W, Dv), _win),
    ]
    new_specs = [
        pl.BlockSpec((1, H_kv, D), lambda b, lr, tr, nr: (b, 0, 0)),
        pl.BlockSpec((1, H_kv, Dv), lambda b, lr, tr, nr: (b, 0, 0)),
    ]
    if quant:
        B_ = k_new.shape[0]
        scale_spec = pl.BlockSpec((1, 1, H_kv, W), _win_s)
        new_scale_spec = pl.BlockSpec(
            (B_, H_kv), lambda b, lr, tr, nr: (0, 0)
        )
        in_specs = kv_specs + [scale_spec, scale_spec] + new_specs + [
            new_scale_spec, new_scale_spec,
        ]
        operands = [k_pool, v_pool, ks_pool, vs_pool,
                    k_new, v_new, ks_new, vs_new]
        out_specs = [kv_specs[0], kv_specs[1], scale_spec, scale_spec]
        out_shape = [
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, ks_pool.dtype),
            jax.ShapeDtypeStruct(vs_pool.shape, vs_pool.dtype),
        ]
        # indices count the scalar-prefetch operands (layer, tables, lengths)
        aliases = {3: 0, 4: 1, 5: 2, 6: 3}
        kernel = functools.partial(_paged_update_kernel, window=W)
    else:
        in_specs = kv_specs + new_specs
        operands = [k_pool, v_pool, k_new, v_new]
        out_specs = [kv_specs[0], kv_specs[1]]
        out_shape = [
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ]
        aliases = {3: 0, 4: 1}
        kernel = functools.partial(_paged_update_kernel_no_scale, window=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, tables, lengths
        grid=(k_new.shape[0],),
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
        page_tables.astype(jnp.int32),
        lengths.astype(jnp.int32),
        *operands,
    )
    if quant:
        return out[0], out[1], out[2], out[3]
    return out[0], out[1], None, None


def paged_kv_update_auto(k_pool, v_pool, ks_pool, vs_pool, k_new, v_new,
                         ks_new, vs_new, page_tables, lengths, layer):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return paged_kv_update(
        k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new, vs_new,
        page_tables, lengths, layer,
        interpret=jax.default_backend() != "tpu",
    )


def paged_kv_update_mesh(
    k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new, vs_new,
    page_tables, lengths, layer, *, mesh, cache_replicated: bool = False,
):
    """shard_map wrapper mirroring paged_decode_attention_mesh's layouts
    (heads over mp when divisible, else replicated — rows never shard).
    Returns None when the layout can't be expressed."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape.get("mp", 1)
    NKV = k_pool.shape[2]
    quant = ks_pool is not None
    interpret = jax.default_backend() != "tpu"
    h_axis = None
    if not cache_replicated and mp > 1 and NKV % mp == 0:
        h_axis = "mp"
    pool_spec = P(None, None, h_axis, None, None)
    scale_spec = P(None, None, h_axis, None)
    new_spec = P(None, h_axis, None)
    new_scale_spec = P(None, h_axis)

    if quant:
        def per_shard(k_, v_, ks_, vs_, kn_, vn_, ksn_, vsn_, tab_, len_, li_):
            return paged_kv_update(
                k_, v_, ks_, vs_, kn_, vn_, ksn_, vsn_, tab_, len_, li_,
                interpret=interpret,
            )

        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(
                pool_spec, pool_spec, scale_spec, scale_spec,
                new_spec, new_spec, new_scale_spec, new_scale_spec,
                P(None, None), P(None), P(),
            ),
            out_specs=(pool_spec, pool_spec, scale_spec, scale_spec),
            check_vma=False,
        )
        return fn(k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new,
                  vs_new, page_tables, lengths, jnp.asarray(layer, jnp.int32))

    def per_shard_nq(k_, v_, kn_, vn_, tab_, len_, li_):
        k2, v2, _, _ = paged_kv_update(
            k_, v_, None, None, kn_, vn_, None, None, tab_, len_, li_,
            interpret=interpret,
        )
        return k2, v2

    fn_nq = shard_map(
        per_shard_nq,
        mesh=mesh,
        in_specs=(pool_spec, pool_spec, new_spec, new_spec,
                  P(None, None), P(None), P()),
        out_specs=(pool_spec, pool_spec),
        check_vma=False,
    )
    k2, v2 = fn_nq(k_pool, v_pool, k_new, v_new, page_tables, lengths,
                   jnp.asarray(layer, jnp.int32))
    return k2, v2, None, None


def paged_decode_attention_auto(
    q, k_pool, v_pool, page_tables, lengths, layer, *, scale,
    ks_pool=None, vs_pool=None,
):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return paged_decode_attention(
        q, k_pool, v_pool, page_tables, lengths, layer, scale=scale,
        ks_pool=ks_pool, vs_pool=vs_pool,
        interpret=jax.default_backend() != "tpu",
    )


def paged_decode_attention_mesh(
    q, k_pool, v_pool, page_tables, lengths, layer, *, scale, mesh,
    cache_replicated: bool = False, ks_pool=None, vs_pool=None,
):
    """shard_map wrapper for the paged pool under a mesh (Pallas calls
    have no GSPMD partitioning rule).

    Layouts (must match parallel.pool_sharding / the engine's choice):
    head-sharded pools (heads over mp when both NH and NKV divide) run
    the kernel per-shard with q's heads split the same way; otherwise —
    including cache_replicated EP-quant serving — the pool is replicated
    and the kernel runs redundantly per shard. Rows never shard: the
    page axis is shared by every row, so a dp-sharded write would need a
    cross-replica reconciliation every step."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape.get("mp", 1)
    B, NH, D = q.shape
    NKV = k_pool.shape[2]
    quant = ks_pool is not None
    interpret = jax.default_backend() != "tpu"
    h_axis = None
    if not cache_replicated and mp > 1 and NH % mp == 0 and NKV % mp == 0:
        h_axis = "mp"
    pool_spec = P(None, None, h_axis, None, None)
    scale_spec = P(None, None, h_axis, None)

    def per_shard(q_, k_, v_, ks_, vs_, tab_, len_, li_):
        return paged_decode_attention(
            q_, k_, v_, tab_, len_, li_, scale=scale,
            ks_pool=ks_ if quant else None,
            vs_pool=vs_ if quant else None,
            interpret=interpret,
        )

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None, h_axis, None),
            pool_spec,
            pool_spec,
            scale_spec if quant else P(),
            scale_spec if quant else P(),
            P(None, None),
            P(None),
            P(),
        ),
        # [B, NH*Dv]: the flattened head-major dim stays sharded over mp
        # — the layout o_proj (input dim over mp) consumes
        out_specs=P(None, h_axis),
        check_vma=False,  # pallas out_shape carries no vma
    )
    zero = jnp.zeros((), jnp.float32)
    return fn(
        q, k_pool, v_pool,
        ks_pool if quant else zero,
        vs_pool if quant else zero,
        page_tables, lengths, jnp.asarray(layer, jnp.int32),
    )


def paged_decode_attention_reference(
    q, k_pool, v_pool, page_tables, lengths, layer, *, scale,
    ks_pool=None, vs_pool=None,
):
    """Pure-jnp oracle for tests: gather the row's pages contiguously and
    run masked softmax attention (dequantizing int8 codes if scales
    are given)."""
    B, H, D = q.shape
    L, P, H_kv, page, Dv = v_pool.shape
    P_max = page_tables.shape[1]
    group = H // H_kv
    k_l = k_pool[layer].astype(jnp.float32)  # [P, H_kv, page, D]
    v_l = v_pool[layer].astype(jnp.float32)
    if ks_pool is not None:
        k_l = k_l * ks_pool[layer][..., None]
        v_l = v_l * vs_pool[layer][..., None]
    # [B, P_max, H_kv, page, D] -> [B, H_kv, P_max*page, D]
    k_rows = k_l[page_tables].transpose(0, 2, 1, 3, 4).reshape(
        B, H_kv, P_max * page, D
    )
    v_rows = v_l[page_tables].transpose(0, 2, 1, 3, 4).reshape(
        B, H_kv, P_max * page, Dv
    )
    if group > 1:
        k_rows = jnp.repeat(k_rows, group, axis=1)
        v_rows = jnp.repeat(v_rows, group, axis=1)
    scores = jnp.einsum(
        "bhd,bhkd->bhk", q.astype(jnp.float32), k_rows
    ) * scale
    pos = jnp.arange(P_max * page)
    mask = pos[None, None, :] <= lengths[:, None, None]
    scores = jnp.where(mask, scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", w, v_rows)
    return out.reshape(B, H * Dv)
