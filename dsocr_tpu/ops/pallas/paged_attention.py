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
  denominator, weighted value sum) across the page walk.

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

from .slot_attention import _select_head_row


def _kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    tables_ref,  # [B, P_max] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, 1, G, D] — all query heads of this KV head
    k_ref,  # [1, 1, 1, page, D] model dtype or int8 codes
    v_ref,  # [1, 1, 1, page, Dv]
    ks_ref,  # [1, 1, H_kv, page] f32 per-token scales (all heads) or None
    vs_ref,  # [1, 1, H_kv, page] f32 or None
    o_ref,  # [1, 1, G, Dv]
    m_ref,  # scratch [1, G]
    l_ref,  # scratch [1, G]
    acc_ref,  # scratch [G, Dv]
    *,
    page: int,
    scale: float,
):
    b = pl.program_id(0)
    kv = pl.program_id(1)
    j = pl.program_id(2)
    n_pos = lengths_ref[b] + 1  # attends [0, lengths[b]] inclusive
    last_page = (n_pos - 1) // page

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_page)
    def _accumulate():
        q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
        k = k_ref[0, 0, 0]  # [page, D]
        v = v_ref[0, 0, 0]  # [page, Dv]
        scores = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # [G, page]
        if ks_ref is not None:
            # int8 codes: per-token K scales fold into the scores (the
            # block carries every head's scales — a (1, page) slice of
            # the [..., H_kv, page] planes is not a legal TPU tile)
            scores = scores * _select_head_row(ks_ref[0, 0], kv)[None, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * page
        scores = jnp.where(pos < n_pos, scores, jnp.float32(-1e30))

        m_prev = m_ref[0]  # [G]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1))
        alpha = jnp.exp(m_prev - m_new)  # [G]
        p = jnp.exp(scores - m_new[:, None])  # [G, page]
        l_ref[0] = l_ref[0] * alpha + jnp.sum(p, axis=1)
        if vs_ref is not None:
            p = p * _select_head_row(vs_ref[0, 0], kv)[None, :]
        acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0, 0] = acc_ref[...] / l_ref[0][:, None]


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

    def _pool_idx(b, kv, j, lr, tr, nr):
        # clamp past-the-end ordinals to the row's last used page:
        # consecutive identical blocks skip the DMA
        return (lr[0], tr[b, jnp.minimum(j, nr[b] // page)], kv, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, G, D), lambda b, kv, j, lr, tr, nr: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, 1, page, D), _pool_idx),
        pl.BlockSpec((1, 1, 1, page, Dv), _pool_idx),
    ]
    operands = [qg, k_pool, v_pool]
    if quant:
        # all H_kv heads of the page per block (tiling-legal); the
        # kernel masks out its head row (_select_head_row)
        scale_spec = pl.BlockSpec(
            (1, 1, H_kv, page),
            lambda b, kv, j, lr, tr, nr: (
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
        grid=(B, H_kv, P_max),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, G, Dv), lambda b, kv, j, lr, tr, nr: (b, kv, 0, 0)
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
