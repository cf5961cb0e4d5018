"""Fused dequantize-matmul for DSQ Q8_0 weights.

The reference keeps ggml-quantized weights packed and dequantizes inside
its QMatMul kernels (dsq-runtime → candle QMatMul). TPU equivalent: the
Q8_0 payload is unpacked at load into int8 codes [M, K] plus f16 block
scales [M, K/32] that stay resident in HBM (~1.06 B/weight vs 2 B for
bf16); this kernel streams a row tile per grid step, dequantizes on the
VPU, and feeds the MXU — HBM traffic is the quantized bytes, which is
the decode-path win.

out[n, m] = Σ_k x[n, k] · scale[m, k//32] · q[m, k]
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q8_BLOCK = 32

# DSOCR_Q8_EXPAND picks how block scales broadcast to full weight shape
# inside the kernels: 'fast' (default) uses a sublane reshape-multiply /
# two-term bf16 expansion; 'matmul' reverts to the original 0/1 f32
# expansion matmul (whose MACs measured ~2.5x the actual weight matmul
# at decode geometry — it dominated the dense-expert kernels).
_EXPAND_DEFAULT = os.environ.get("DSOCR_Q8_EXPAND", "fast")


def _dequant_w_rows(q: jnp.ndarray, s: jnp.ndarray, mode: str) -> jnp.ndarray:
    """int8 codes [h, T] + block scales [h/32, T] → bf16 weights [h, T].

    Modes (DSOCR_Q8_EXPAND / kernel `expand=` arg):
      fast    f32 product, one bf16 round: bf16(f32(q) · s_full)  (default)
      matmul  like fast but expands scales with the legacy 0/1 matmul
      bf16    all-bf16 dequant: bf16(q) · bf16(s_full) — one fewer VPU
              pass per weight (no f32 intermediates); scales round to
              bf16 before the product (~2^-8.4 weight error vs fast's
              2^-8) — a VPU-pressure diagnostic/perf mode
      none    bf16(q) only — numerics-WRONG ceiling probe that measures
              the kernel's pure stream+convert+matmul rate
    """
    h = q.shape[0]
    if mode == "bf16":
        nb, t = s.shape
        s_full = jnp.broadcast_to(
            s.astype(jnp.bfloat16)[:, None, :], (nb, Q8_BLOCK, t)
        ).reshape(h, t)
        return q.astype(jnp.bfloat16) * s_full
    if mode == "none":
        return q.astype(jnp.bfloat16)
    qf = q.astype(jnp.float32)
    return (qf * _expand_rows(s, h, mode)).astype(jnp.bfloat16)


def _expand_rows(s: jnp.ndarray, h: int, mode: str) -> jnp.ndarray:
    """[h/32, T] f32 → [h, T] f32 with row i taking s[i // 32].

    The expansion runs down the SUBLANE dim, so a broadcast+reshape does
    it with no MXU work at all (numerically identical to the selection
    matmul: each output row is exactly one input row)."""
    nb, t = s.shape
    if mode == "fast":
        return jnp.broadcast_to(s[:, None, :], (nb, Q8_BLOCK, t)).reshape(h, t)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, nb), 1)
    expand = (rows // Q8_BLOCK == cols).astype(jnp.float32)
    return jax.lax.dot_general(
        expand, s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _expand_cols(s: jnp.ndarray, k: int, mode: str) -> jnp.ndarray:
    """[MT, k/32] f32 → [MT, k] with column j taking s[:, j // 32].

    Expansion across the LANE dim must stay a matmul (Mosaic rejects
    lane-splitting reshapes), but Q8_0 scales are f16-origin (≤ 11
    significand bits), so a two-term bf16 split reconstructs them
    EXACTLY — each product selects one scale (0/1 matrix), f32
    accumulation adds the two bf16 halves back — using full-rate bf16
    MXU passes instead of a multi-pass f32 matmul."""
    nb = k // Q8_BLOCK
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    sel = cols // Q8_BLOCK == rows
    if mode == "fast":
        expand = sel.astype(jnp.bfloat16)
        s1 = s.astype(jnp.bfloat16)
        s2 = (s - s1.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(a):
            return jax.lax.dot_general(
                a, expand, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return dot(s1) + dot(s2)
    return jax.lax.dot_general(
        s, sel.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def pack_q8_0(payload: bytes, rows: int, cols: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DSQ Q8_0 payload → (codes [rows, cols] int8, scales [rows, cols/32]
    f32 — stored f32 for clean VPU broadcast; scale bytes are negligible)."""
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, 34)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    codes = blocks[:, 2:].copy().view(np.int8)
    n_blocks = cols // Q8_BLOCK
    return (
        jnp.asarray(codes.reshape(rows, cols)),
        jnp.asarray(scales.reshape(rows, n_blocks)),
    )


def _kernel(x_ref, q_ref, s_ref, out_ref, *, expand_mode=_EXPAND_DEFAULT):
    q = q_ref[...].astype(jnp.float32)  # [MT, K]
    s = s_ref[...]  # [MT, K // 32]
    mt, k = q.shape
    s_full = _expand_cols(s, k, expand_mode)
    # bf16 MXU dot (f32 accumulate) — int8 codes are exact in bf16, the
    # scale product rounds like any bf16-served weight
    w = (q * s_full).astype(jnp.bfloat16)
    out_ref[...] = jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pick_tile(dim: int, want: int, align: int) -> int:
    """Largest tile ≤ want that divides dim and satisfies Mosaic's
    alignment (multiple of `align`, or the whole dim)."""
    tile = min(want, dim)
    while dim % tile or (tile % align and tile != dim):
        if tile <= align:
            return dim
        tile //= 2
    return tile


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile", "expand"))
def q8_matmul(
    x: jnp.ndarray,  # [N, K]
    codes: jnp.ndarray,  # [M, K] int8
    scales: jnp.ndarray,  # [M, K/32] f32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    """Returns x @ dequant(W)^T as [N, M] f32."""
    n, k = x.shape
    m = codes.shape[0]
    # Mosaic needs the output lane dim (m_tile) to be a 128-multiple or
    # the whole array; callers pad awkward out-dims (see
    # models/deepseek/quantize.py) so this only falls back for tiny m.
    # N (sublanes) tiles at multiples of 8 so prefill-sized x stays
    # within VMEM.
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, expand_mode=expand),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m_tile, k // Q8_BLOCK), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_tile, m_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(x, codes, scales)
    return out


def q8_matmul_auto(x, codes, scales):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return q8_matmul(x, codes, scales, interpret=jax.default_backend() != "tpu")


def _gather_kernel(idx_ref, x_ref, q_ref, s_ref, out_ref, *,
                   expand_mode=_EXPAND_DEFAULT):
    del idx_ref  # consumed by the index maps
    ni = pl.program_id(1)
    n, h = x_ref.shape
    q = q_ref[0].astype(jnp.float32)  # [H, tile]
    s = s_ref[0]  # [H // 32, tile]
    # expand block scales down the sublane (contraction) dim:
    # s_full[h, t] = s[h // 32, t]
    s_full = _expand_rows(s, h, expand_mode)
    w = (q * s_full).astype(jnp.bfloat16)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    xrow = jnp.sum(
        jnp.where(row_ids == ni, x_ref[...].astype(jnp.float32), 0),
        axis=0,
        keepdims=True,
    ).astype(jnp.bfloat16)
    row = jax.lax.dot_general(
        xrow, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, tile]
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "expand"))
def q8_gather_matmul(
    x: jnp.ndarray,  # [N, H]
    codes: jnp.ndarray,  # [E, H, M] int8 (in-major — see ops.moe layout note)
    scales: jnp.ndarray,  # [E, H/32, M] f32
    idx: jnp.ndarray,  # [N] int32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    tile: int = 0,
) -> jnp.ndarray:
    """out[n] = x[n] @ dequant(W[idx[n]]) → [N, M] f32.

    Scalar-prefetch gather: each grid step DMAs only the selected
    expert's quantized tile (≈0.53 B/weight) HBM→VMEM, dequantizes on
    the VPU, and runs a bf16 MXU dot — the decode-path MoE reads about
    a quarter of the bf16 bytes."""
    n, h = x.shape
    e, _, m = codes.shape
    if not tile:
        tile = _expert_tile(m, h)
    grid = (m // tile, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, h), lambda ji, ni, idx: (0, 0)),
            pl.BlockSpec((1, h, tile), lambda ji, ni, idx: (idx[ni], 0, ji)),
            pl.BlockSpec((1, h // Q8_BLOCK, tile), lambda ji, ni, idx: (idx[ni], 0, ji)),
        ],
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx: (0, ji)),
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, expand_mode=expand),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), x, codes, scales)


def q8_gather_matmul_auto(x, codes, scales, idx):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return q8_gather_matmul(
        x, codes, scales, idx, interpret=jax.default_backend() != "tpu"
    )


def _layered_matmul_kernel(li_ref, x_ref, q_ref, s_ref, out_ref, *,
                           expand_mode=_EXPAND_DEFAULT):
    del li_ref  # consumed by the index maps
    q = q_ref[0].astype(jnp.float32)  # [MT, K]
    s = s_ref[0]  # [MT, K // 32]
    mt, k = q.shape
    s_full = _expand_cols(s, k, expand_mode)
    w = (q * s_full).astype(jnp.bfloat16)
    out_ref[...] = jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile", "expand"))
def q8_matmul_layered(
    x: jnp.ndarray,  # [N, K]
    codes: jnp.ndarray,  # [L, M, K] int8
    scales: jnp.ndarray,  # [L, M, K/32] f32
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    """x @ dequant(W[layer])^T without slicing the stack: the layer index
    rides scalar prefetch, so lax.scan bodies can keep the whole [L,...]
    stack in HBM and the kernel DMAs only W[layer]'s tiles (an XLA
    dynamic-slice feeding a custom call materializes a full copy of the
    sliced layer every call)."""
    n, k = x.shape
    L, m, _ = codes.shape
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tile, k), lambda i, j, li: (i, 0)),
            pl.BlockSpec((1, m_tile, k), lambda i, j, li: (li[0], j, 0)),
            pl.BlockSpec((1, m_tile, k // Q8_BLOCK), lambda i, j, li: (li[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((n_tile, m_tile), lambda i, j, li: (i, j)),
    )
    return pl.pallas_call(
        functools.partial(_layered_matmul_kernel, expand_mode=expand),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, codes, scales)


def q8_matmul_layered_auto(x, codes, scales, layer):
    return q8_matmul_layered(
        x, codes, scales, layer, interpret=jax.default_backend() != "tpu"
    )


def _layered_gather_kernel(idx_ref, li_ref, x_ref, q_ref, s_ref, out_ref, *,
                           expand_mode=_EXPAND_DEFAULT):
    del idx_ref, li_ref  # consumed by the index maps
    ni = pl.program_id(1)
    n, h = x_ref.shape
    q = q_ref[0, 0].astype(jnp.float32)  # [H, tile]
    s = s_ref[0, 0]  # [H // 32, tile]
    s_full = _expand_rows(s, h, expand_mode)
    w = (q * s_full).astype(jnp.bfloat16)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    xrow = jnp.sum(
        jnp.where(row_ids == ni, x_ref[...].astype(jnp.float32), 0),
        axis=0,
        keepdims=True,
    ).astype(jnp.bfloat16)
    row = jax.lax.dot_general(
        xrow, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "expand"))
def q8_gather_matmul_layered(
    x: jnp.ndarray,  # [N, H]
    codes: jnp.ndarray,  # [L, E, H, M] int8
    scales: jnp.ndarray,  # [L, E, H/32, M] f32
    idx: jnp.ndarray,  # [N] int32
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    tile: int = 0,
) -> jnp.ndarray:
    """Layered q8_gather_matmul: expert stacks stay whole across the
    layer scan; (layer, expert) indices both ride scalar prefetch."""
    n, h = x.shape
    L, e, _, m = codes.shape
    if not tile:
        tile = _expert_tile(m, h)
    grid = (m // tile, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, h), lambda ji, ni, idx, li: (0, 0)),
            pl.BlockSpec(
                (1, 1, h, tile), lambda ji, ni, idx, li: (li[0], idx[ni], 0, ji)
            ),
            pl.BlockSpec(
                (1, 1, h // Q8_BLOCK, tile),
                lambda ji, ni, idx, li: (li[0], idx[ni], 0, ji),
            ),
        ],
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx, li: (0, ji)),
    )
    return pl.pallas_call(
        functools.partial(_layered_gather_kernel, expand_mode=expand),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        x,
        codes,
        scales,
    )


def q8_gather_matmul_layered_auto(x, codes, scales, idx, layer):
    return q8_gather_matmul_layered(
        x, codes, scales, idx, layer, interpret=jax.default_backend() != "tpu"
    )


# ---------------------------------------------------------------------------
# Dense ALL-expert matmuls (packed weights, read each expert ONCE)
#
# The per-selection gather kernels above re-read shared experts: at
# occupancy N with top-K routing they stream N*K expert matrices. Once
# N*K > E (e.g. 16 rows x top-6 = 96 > 64 experts), running EVERY expert
# once — the bf16 decode tier's moe_apply_dense strategy — moves fewer
# bytes; these kernels do that dense sweep straight from the packed int8
# codes (~half the bf16 bytes), writing [E, N, M] for the caller's
# take_along_axis combine.
# ---------------------------------------------------------------------------


def _dense_experts_kernel(li_ref, x_ref, q_ref, s_ref, out_ref, *,
                          expand_mode=_EXPAND_DEFAULT):
    del li_ref  # consumed by the index maps
    w = _dequant_w_rows(q_ref[0, 0], s_ref[0, 0], expand_mode)
    out_ref[0] = jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16), w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dense_experts_perx_kernel(li_ref, x_ref, q_ref, s_ref, out_ref, *,
                               expand_mode=_EXPAND_DEFAULT):
    del li_ref
    w = _dequant_w_rows(q_ref[0, 0], s_ref[0, 0], expand_mode)
    out_ref[0] = jax.lax.dot_general(
        x_ref[0].astype(jnp.bfloat16), w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _expert_tile(m: int, h: int = 0) -> int:
    """Output tile for the expert kernels: the largest 128-multiple
    divisor of m whose per-grid-step VMEM footprint stays under ~14 MB
    (q f32 4B + s_full f32 4B + w bf16 2B + double-buffered codes 2B
    per weight ≈ 12·h·tile bytes; v5e VMEM is ~16 MB). Swept on TPU at
    decode geometry: gate+up [1280→1792] picks 896 and down
    [896→1280] picks the full 1280 — 7.15 → 5.26 ms/step (+36%) over
    the old halve-from-512 heuristic (bench.kernels --suite moe)."""
    if m % 128:
        return m
    t_max = (14_000_000 // (12 * h)) if h else 512
    best = 0
    t = 128
    while t <= m:
        if m % t == 0 and t <= t_max:
            best = t
        t += 128
    return best or min(m, 128)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "expand"))
def q8_dense_experts_layered(
    x: jnp.ndarray,  # [N, H] — shared across experts (gate/up input)
    codes: jnp.ndarray,  # [L, E, H, M] int8 (in-major)
    scales: jnp.ndarray,  # [L, E, H/32, M] f32
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x @ dequant(W[layer, e]) → [E, N, M]."""
    n, h = x.shape
    L, e, _, m = codes.shape
    tile = tile or _expert_tile(m, h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[
            pl.BlockSpec((n, h), lambda ei, ji, li: (0, 0)),
            pl.BlockSpec((1, 1, h, tile), lambda ei, ji, li: (li[0], ei, 0, ji)),
            pl.BlockSpec(
                (1, 1, h // Q8_BLOCK, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
            ),
        ],
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        functools.partial(_dense_experts_kernel, expand_mode=expand),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, codes, scales)


def q8_dense_experts_layered_auto(x, codes, scales, layer):
    return q8_dense_experts_layered(
        x, codes, scales, layer, interpret=jax.default_backend() != "tpu"
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "expand"))
def q8_dense_experts_perx_layered(
    x: jnp.ndarray,  # [E, N, K] — per-expert input (down projection)
    codes: jnp.ndarray,  # [L, E, K, M] int8
    scales: jnp.ndarray,  # [L, E, K/32, M] f32
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    expand: str = _EXPAND_DEFAULT,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x[e] @ dequant(W[layer, e]) → [E, N, M]."""
    e, n, k = x.shape
    L, _, _, m = codes.shape
    tile = tile or _expert_tile(m, k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[
            pl.BlockSpec((1, n, k), lambda ei, ji, li: (ei, 0, 0)),
            pl.BlockSpec((1, 1, k, tile), lambda ei, ji, li: (li[0], ei, 0, ji)),
            pl.BlockSpec(
                (1, 1, k // Q8_BLOCK, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
            ),
        ],
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        functools.partial(_dense_experts_perx_kernel, expand_mode=expand),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, codes, scales)


def q8_dense_experts_perx_layered_auto(x, codes, scales, layer):
    return q8_dense_experts_perx_layered(
        x, codes, scales, layer, interpret=jax.default_backend() != "tpu"
    )


# ---------------------------------------------------------------------------
# Mega-fused dense MoE: gate+up -> silu*up -> down -> weighted combine in
# ONE kernel, grid over experts.
#
# The two-kernel dense sweep above round-trips every per-expert
# intermediate through HBM: gate+up writes [E, N, 2*MI] f32, XLA reads
# it for the activation and writes [E, N, MI] bf16, the down kernel
# writes [E, N, H] f32, and the combine transposes + gathers it
# (~44 MB/layer at serving geometry — ~0.5 GB per decode step that the
# weights-bandwidth analysis says is pure overhead). Here each grid
# step processes one expert end-to-end in VMEM: dequant gate+up in
# 128-aligned column chunks, activate, dequant down in chunks, and
# accumulate w[e, n] * down_out into the [N, H] output block (which
# never leaves VMEM across the expert grid). Routing weights arrive as
# a dense [E, N] f32 map (zeros for unselected experts) — the
# take_along_axis combine disappears into the accumulation.
# ---------------------------------------------------------------------------


def _chunk_cols(m: int, want: int) -> int:
    """Largest 128-multiple divisor of m that is <= want (the in-kernel
    dequant works lane-chunk by lane-chunk to bound VMEM temporaries);
    whole dim for small/odd m (tiny test configs, interpret mode)."""
    if m % 128:
        return m
    best = m
    t = 128
    while t <= m:
        if m % t == 0 and t <= want:
            best = t
        t += 128
    return best if best <= want else m


def _megafused_kernel(
    li_ref,  # [1] int32 (scalar prefetch)
    x_ref,  # [N, H] bf16/f32
    w_ref,  # [E, N] f32 dense routing weights
    gu_c_ref,  # [1, 1, H, 2*MI] int8
    gu_s_ref,  # [1, 1, H/32, 2*MI] f32
    dn_c_ref,  # [1, 1, MI, H] int8
    dn_s_ref,  # [1, 1, MI/32, H] f32
    out_ref,  # [N, H] f32 — constant block: lives in VMEM across the grid
    *,
    gu_chunk: int,
    dn_chunk: int,
    expand_mode=_EXPAND_DEFAULT,
):
    del li_ref
    e = pl.program_id(0)
    n, h = x_ref.shape
    mi2 = gu_c_ref.shape[-1]
    mi = mi2 // 2

    @pl.when(e == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].astype(jnp.bfloat16)

    def deq_mm(xin, c_ref, s_ref, c0, width):
        w = _dequant_w_rows(
            c_ref[0, 0, :, c0 : c0 + width],
            s_ref[0, 0, :, c0 : c0 + width],
            expand_mode,
        )
        return jax.lax.dot_general(
            xin, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    gu_parts = [
        deq_mm(x, gu_c_ref, gu_s_ref, c0, gu_chunk)
        for c0 in range(0, mi2, gu_chunk)
    ]
    gus = jnp.concatenate(gu_parts, axis=1) if len(gu_parts) > 1 else gu_parts[0]
    gate, up = gus[:, :mi], gus[:, mi:]
    inter = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)  # [N, MI]

    dn_parts = [
        deq_mm(inter, dn_c_ref, dn_s_ref, c0, dn_chunk)
        for c0 in range(0, h, dn_chunk)
    ]
    dn = jnp.concatenate(dn_parts, axis=1) if len(dn_parts) > 1 else dn_parts[0]

    # select this expert's routing-weight row by mask ((1, N) blocks are
    # not a legal TPU tile — see slot_attention's new-scale ride-along)
    row = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 0) == e
    we = jnp.sum(jnp.where(row, w_ref[...], 0.0), axis=0)  # [N]
    out_ref[...] += we[:, None] * dn


@functools.partial(
    jax.jit, static_argnames=("interpret", "gu_chunk", "dn_chunk", "expand")
)
def q8_moe_megafused_layered(
    x: jnp.ndarray,  # [N, H]
    weights: jnp.ndarray,  # [E, N] f32 dense routing weights (0 = unrouted)
    gu_codes: jnp.ndarray,  # [L, E, H, 2*MI] int8
    gu_scales: jnp.ndarray,  # [L, E, H/32, 2*MI] f32
    dn_codes: jnp.ndarray,  # [L, E, MI, H] int8
    dn_scales: jnp.ndarray,  # [L, E, MI/32, H] f32
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    gu_chunk: int = 256,
    dn_chunk: int = 640,
    expand: str = _EXPAND_DEFAULT,
) -> jnp.ndarray:
    """out[n] = Σ_e weights[e, n] · (silu(x@Wg[e]) * (x@Wu[e])) @ Wd[e]
    → [N, H] f32. Reads each expert's packed weights exactly once; no
    [E, N, *] intermediate ever touches HBM."""
    n, h = x.shape
    L, e, _, mi2 = gu_codes.shape
    gu_chunk = _chunk_cols(mi2, gu_chunk)
    dn_chunk = _chunk_cols(h, dn_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e,),
        in_specs=[
            pl.BlockSpec((n, h), lambda ei, li: (0, 0)),
            pl.BlockSpec(weights.shape, lambda ei, li: (0, 0)),
            pl.BlockSpec((1, 1, h, mi2), lambda ei, li: (li[0], ei, 0, 0)),
            pl.BlockSpec(
                (1, 1, h // Q8_BLOCK, mi2), lambda ei, li: (li[0], ei, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, mi2 // 2, h), lambda ei, li: (li[0], ei, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, mi2 // 2 // Q8_BLOCK, h),
                lambda ei, li: (li[0], ei, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((n, h), lambda ei, li: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _megafused_kernel,
            gu_chunk=gu_chunk,
            dn_chunk=dn_chunk,
            expand_mode=expand,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x,
        weights.astype(jnp.float32),
        gu_codes,
        gu_scales,
        dn_codes,
        dn_scales,
    )


def q8_moe_megafused_layered_auto(x, weights, gu_codes, gu_scales, dn_codes,
                                  dn_scales, layer):
    return q8_moe_megafused_layered(
        x, weights, gu_codes, gu_scales, dn_codes, dn_scales, layer,
        interpret=jax.default_backend() != "tpu",
    )
