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


def _kernel(
    layer_ref,  # [1] int32 (scalar prefetch)
    tables_ref,  # [B, P_max] int32 (scalar prefetch)
    lengths_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, 1, D]
    k_ref,  # [1, 1, 1, page, D] model dtype or int8 codes
    v_ref,  # [1, 1, 1, page, Dv]
    ks_ref,  # [1, 1, 1, page] f32 per-token scales or None
    vs_ref,  # [1, 1, 1, page] f32 or None
    o_ref,  # [1, 1, Dv]
    m_ref,  # scratch [1, 1]
    l_ref,  # scratch [1, 1]
    acc_ref,  # scratch [1, Dv]
    *,
    page: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_pos = lengths_ref[b] + 1  # attends [0, lengths[b]] inclusive
    last_page = (n_pos - 1) // page

    @pl.when(j == 0)
    def _init():
        m_ref[0, 0] = jnp.float32(-1e30)
        l_ref[0, 0] = jnp.float32(0.0)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_page)
    def _accumulate():
        q = q_ref[0]  # [1, D]
        k = k_ref[0, 0, 0]  # [page, D]
        v = v_ref[0, 0, 0]  # [page, Dv]
        scores = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)  # [1, page]
        if ks_ref is not None:
            # int8 codes: per-token K scales fold into the scores
            scores = scores * ks_ref[0, 0, 0][None, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1) + j * page
        scores = jnp.where(pos < n_pos, scores, jnp.float32(-1e30))

        m_prev = m_ref[0, 0]
        m_new = jnp.maximum(m_prev, jnp.max(scores))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [1, page]
        l_ref[0, 0] = l_ref[0, 0] * alpha + jnp.sum(p)
        if vs_ref is not None:
            p = p * vs_ref[0, 0, 0][None, :]
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0, 0] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = acc_ref[...] / l_ref[0, 0]


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
    group = H // H_kv
    P_max = page_tables.shape[1]
    quant = ks_pool is not None

    def _pool_idx(b, h, j, lr, tr, nr):
        # clamp past-the-end ordinals to the row's last used page:
        # consecutive identical blocks skip the DMA
        return (lr[0], tr[b, jnp.minimum(j, nr[b] // page)], h // group, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, D), lambda b, h, j, lr, tr, nr: (b, h, 0)),
        pl.BlockSpec((1, 1, 1, page, D), _pool_idx),
        pl.BlockSpec((1, 1, 1, page, Dv), _pool_idx),
    ]
    operands = [q, k_pool, v_pool]
    if quant:
        scale_spec = pl.BlockSpec(
            (1, 1, 1, page),
            lambda b, h, j, lr, tr, nr: (
                lr[0], tr[b, jnp.minimum(j, nr[b] // page)], h // group, 0
            ),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ks_pool, vs_pool]
        kernel = functools.partial(_kernel, page=page, scale=scale)
    else:
        kernel = functools.partial(_no_scale_kernel, page=page, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, tables, lengths
        grid=(B, H, P_max),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Dv), lambda b, h, j, lr, tr, nr: (b, h, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        page_tables.astype(jnp.int32),
        lengths.astype(jnp.int32),
        q,
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
