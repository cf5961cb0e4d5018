"""Fused expert-gather matmul.

`out[n] = x[n] @ w[idx[n]]` for a stacked expert weight tensor
w [E, H, I]. XLA compiles the naive `w[idx] @ x` into a materialized
gather (full HBM write + re-read of every selected expert); this kernel
uses Pallas scalar prefetch so each grid step DMAs exactly the selected
expert's tile HBM→VMEM and feeds the MXU directly — the decode-path MoE
then reads K/E of the expert bytes and nothing else.

Used by ops.moe.moe_apply for small token counts on TPU; other backends
fall back to the XLA gather path (tests run the kernel in interpreter
mode for correctness).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int, i: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest 128-multiple divisor of `i` whose [h, tile] block fits the
    VMEM budget; falls back to full `i`."""
    if i % 128:
        return i
    best = i
    tile = i
    while tile % 2 == 0 and h * tile * 2 > vmem_budget and tile % 128 == 0:
        tile //= 2
    if tile % 128 == 0 and i % tile == 0:
        best = tile
    return best


def _kernel(idx_ref, x_ref, w_ref, out_ref):
    del idx_ref  # consumed by the weight index map
    ni = pl.program_id(1)
    n, h = x_ref.shape
    # Row selection via masked reduction (dynamic sublane slices need
    # 8-alignment Mosaic can't prove here; n is tiny so this is free).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    xrow = jnp.sum(
        jnp.where(row_ids == ni, x_ref[...], 0).astype(jnp.float32),
        axis=0,
        keepdims=True,
    ).astype(x_ref.dtype)
    row = jax.lax.dot_general(
        xrow,
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, tile]
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_matmul(
    x: jnp.ndarray,  # [N, H]
    w: jnp.ndarray,  # [E, H, I]
    idx: jnp.ndarray,  # [N] int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [N, I] f32 with out[n] = x[n] @ w[idx[n]]."""
    n, h = x.shape
    e, _, i = w.shape
    tile = _pick_tile(h, i)
    # rows iterate fastest so the output block stays VMEM-resident while
    # all rows of one tile column are filled
    grid = (i // tile, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # all N rows stay resident; the kernel picks its row
            pl.BlockSpec((n, h), lambda ji, ni, idx: (0, 0)),
            pl.BlockSpec((1, h, tile), lambda ji, ni, idx: (idx[ni], 0, ji)),
        ],
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx: (0, ji)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, i), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), x, w)


def gather_matmul_auto(x, w, idx):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return gather_matmul(x, w, idx, interpret=jax.default_backend() != "tpu")
