"""Fused dequantize-matmul for DSQ Q4_K / Q6_K (ggml k-quant) weights.

The reference serves k-quant weights packed, dequantizing inside candle's
QMatMul (dsq-runtime/src/lib.rs:316-369; block layouts produced by
dsq-writer/src/lib.rs:600-660). TPU equivalent: the 256-element
super-block payload is repacked at load into PLANE-DECOMPOSED arrays that
stay quantized in HBM, and these Pallas kernels stream row tiles,
decode the 4/6-bit codes on the VPU, and feed bf16 MXU dots.

Plane decomposition (the TPU trick): Mosaic cannot cheaply interleave or
lane-slice inside a kernel, so the PACKING chooses which weight columns
share a byte. A Q4_K byte holds columns (j, j + K/2): the kernel computes
out = x[:, :K/2] @ w_lo + x[:, K/2:] @ w_hi with the x-halves sliced by
the CALLER at XLA level — no in-kernel data movement at all. Q6_K uses
four K/4 planes (low nibbles in two byte arrays, 2-bit highs four-to-a-
byte). The k-sum is order-invariant, so any column partition is exact.

Per-sub-block constants are PREMULTIPLIED at pack time (Q4_K:
s = d·sc, b = dmin·m per 32; Q6_K: s = d·sc per 16) — exact in f32
(f16 mantissa + 6/8-bit int fits in 24 bits), so dequantized values are
bit-identical to dsq.quant.dequantize_*.

HBM bytes per weight: Q4_K 0.75 (0.5 codes + 0.25 f32 scale/bias),
Q6_K 1.0 — vs 2.0 for bf16.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...dsq.quant import (
    Q4K_BLOCK_BYTES,
    Q6K_BLOCK_BYTES,
    QK_K,
    _unpack_q4k_scales,
)
from .dequant_matmul import _pick_tile

# Q4_K sub-block = 32 elements, Q6_K sub-block = 16 elements.
Q4K_SUB = 32
Q6K_SUB = 16


# ---------------------------------------------------------------------------
# host-side payload → TPU plane layout
# ---------------------------------------------------------------------------


def _q4k_decode_payload(payload: bytes, rows: int, cols: int):
    """ggml Q4_K payload → (L [rows, cols] uint8 codes 0..15,
    s [rows, cols/32] f32 = d·sc, b [rows, cols/32] f32 = dmin·m)."""
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, Q4K_BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc, m = _unpack_q4k_scales(blocks[:, 4:16])
    qs = blocks[:, 16:144]
    L = np.zeros((nb, QK_K), np.uint8)
    for j in range(0, QK_K, 64):
        seg = qs[:, j // 2 : j // 2 + 32]
        L[:, j : j + 32] = seg & 0xF
        L[:, j + 32 : j + 64] = seg >> 4
    s = (d[:, None] * sc).astype(np.float32).reshape(rows, cols // Q4K_SUB)
    b = (dmin[:, None] * m).astype(np.float32).reshape(rows, cols // Q4K_SUB)
    return L.reshape(rows, cols), s, b


def pack_q4_k(payload: bytes, rows: int, cols: int) -> Dict[str, jnp.ndarray]:
    """DSQ Q4_K payload → halves-plane dict for q4k_matmul:
    packed [rows, cols/2] uint8 (lo nibble = col j, hi = col j + cols/2),
    s_lo/s_hi [rows, cols/64] f32, b_lo/b_hi [rows, cols/64] f32."""
    if cols % (2 * Q4K_SUB):
        raise ValueError(f"cols {cols} not a multiple of 64")
    L, s, b = _q4k_decode_payload(payload, rows, cols)
    half = cols // 2
    packed = (L[:, :half] | (L[:, half:] << 4)).astype(np.uint8)
    nbh = half // Q4K_SUB
    return {
        "packed": jnp.asarray(packed),
        "s_lo": jnp.asarray(s[:, :nbh]),
        "s_hi": jnp.asarray(s[:, nbh:]),
        "b_lo": jnp.asarray(b[:, :nbh]),
        "b_hi": jnp.asarray(b[:, nbh:]),
    }


def _q6k_decode_payload(payload: bytes, rows: int, cols: int):
    """ggml Q6_K payload → (L [rows, cols] uint8 codes 0..63,
    s [rows, cols/16] f32 = d·sc)."""
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, Q6K_BLOCK_BYTES)
    nb = blocks.shape[0]
    ql = blocks[:, :128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32).reshape(nb)
    L = np.zeros((nb, QK_K), np.uint8)
    for halfi in range(2):
        base = halfi * 128
        lo0 = ql[:, halfi * 64 + 0 : halfi * 64 + 32]
        lo1 = ql[:, halfi * 64 + 32 : halfi * 64 + 64]
        hi = qh[:, halfi * 32 : halfi * 32 + 32]
        L[:, base + 0 : base + 32] = (lo0 & 0xF) | ((hi & 0x3) << 4)
        L[:, base + 32 : base + 64] = (lo1 & 0xF) | (((hi >> 2) & 0x3) << 4)
        L[:, base + 64 : base + 96] = (lo0 >> 4) | (((hi >> 4) & 0x3) << 4)
        L[:, base + 96 : base + 128] = (lo1 >> 4) | (((hi >> 6) & 0x3) << 4)
    s = (d[:, None] * scales).astype(np.float32).reshape(rows, cols // Q6K_SUB)
    return L.reshape(rows, cols), s


def pack_q6_k(payload: bytes, rows: int, cols: int) -> Dict[str, jnp.ndarray]:
    """DSQ Q6_K payload → quarter-plane dict for q6k_matmul:
    ql_a [rows, cols/4] (lo nibble = Q0, hi = Q2),
    ql_b [rows, cols/4] (lo = Q1, hi = Q3),
    qh   [rows, cols/4] (2-bit highs: Q0 | Q1<<2 | Q2<<4 | Q3<<6),
    s0..s3 [rows, cols/64] f32 per-quarter d·sc."""
    if cols % (4 * Q6K_SUB):
        raise ValueError(f"cols {cols} not a multiple of 64")
    L, s = _q6k_decode_payload(payload, rows, cols)
    q = cols // 4
    Q = [L[:, i * q : (i + 1) * q] for i in range(4)]
    ql_a = ((Q[0] & 0xF) | ((Q[2] & 0xF) << 4)).astype(np.uint8)
    ql_b = ((Q[1] & 0xF) | ((Q[3] & 0xF) << 4)).astype(np.uint8)
    qh = (
        (Q[0] >> 4) | ((Q[1] >> 4) << 2) | ((Q[2] >> 4) << 4) | ((Q[3] >> 4) << 6)
    ).astype(np.uint8)
    nbq = q // Q6K_SUB
    return {
        "ql_a": jnp.asarray(ql_a),
        "ql_b": jnp.asarray(ql_b),
        "qh": jnp.asarray(qh),
        **{
            f"s{i}": jnp.asarray(s[:, i * nbq : (i + 1) * nbq]) for i in range(4)
        },
    }


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------


def _expand_cols(s: jnp.ndarray, block: int, k: int) -> jnp.ndarray:
    """[MT, k/block] → [MT, k]: broadcast block scales across their columns
    via a 0/1 expansion matmul (Mosaic rejects repeat across the lane dim)."""
    nb = k // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    expand = (cols // block == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        s, expand, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _expand_rows(s: jnp.ndarray, block: int, h: int) -> jnp.ndarray:
    """[h/block, T] → [h, T]: broadcast block scales down the sublane dim.

    Sublane expansion is a broadcast+reshape (numerically identical to
    the 0/1 selection matmul it replaces, and free of its MXU cost —
    see dequant_matmul._expand_rows). DSOCR_KQ_EXPAND=matmul reverts."""
    nb = h // block
    t = s.shape[-1]
    if os.environ.get("DSOCR_KQ_EXPAND", "fast") == "fast":
        return jnp.broadcast_to(s[:, None, :], (nb, block, t)).reshape(h, t)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, nb), 1)
    expand = (rows // block == cols).astype(jnp.float32)
    return jax.lax.dot_general(
        expand, s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(x, w):
    """x [N, K] · w [M, K]ᵀ → [N, M] f32 via bf16 MXU."""
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Q4_K plain matmul
# ---------------------------------------------------------------------------


def _q4k_kernel(x_lo_ref, x_hi_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref):
    packed = p_ref[...].astype(jnp.int32)  # [MT, K/2]
    mt, kh = packed.shape
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    w_lo = lo * _expand_cols(sl_ref[...], Q4K_SUB, kh) - _expand_cols(
        bl_ref[...], Q4K_SUB, kh
    )
    w_hi = hi * _expand_cols(sh_ref[...], Q4K_SUB, kh) - _expand_cols(
        bh_ref[...], Q4K_SUB, kh
    )
    out_ref[...] = _dot_t(x_lo_ref[...], w_lo) + _dot_t(x_hi_ref[...], w_hi)


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile"))
def q4k_matmul(
    x: jnp.ndarray,  # [N, K]
    w: Dict[str, jnp.ndarray],  # pack_q4_k output for [M, K] weights
    interpret: bool = False,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    """Returns x @ dequant(W)ᵀ as [N, M] f32."""
    n, k = x.shape
    m, kh = w["packed"].shape
    nbh = kh // Q4K_SUB
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    x_lo, x_hi = x[:, :kh], x[:, kh:]
    out = pl.pallas_call(
        _q4k_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tile, kh), lambda i, j: (i, 0)),
            pl.BlockSpec((n_tile, kh), lambda i, j: (i, 0)),
            pl.BlockSpec((m_tile, kh), lambda i, j: (j, 0)),
            pl.BlockSpec((m_tile, nbh), lambda i, j: (j, 0)),
            pl.BlockSpec((m_tile, nbh), lambda i, j: (j, 0)),
            pl.BlockSpec((m_tile, nbh), lambda i, j: (j, 0)),
            pl.BlockSpec((m_tile, nbh), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((n_tile, m_tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"])
    return out


def q4k_matmul_auto(x, w):
    return q4k_matmul(x, w, interpret=jax.default_backend() != "tpu")


# ---------------------------------------------------------------------------
# Q6_K plain matmul
# ---------------------------------------------------------------------------


def _q6k_kernel(
    x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    a = qa_ref[...].astype(jnp.int32)  # [MT, K/4]
    b = qb_ref[...].astype(jnp.int32)
    h = qh_ref[...].astype(jnp.int32)
    mt, kq = a.shape
    planes = (
        ((a & 0xF) | ((h & 3) << 4), s0_ref, x0_ref),
        ((b & 0xF) | (((h >> 2) & 3) << 4), s1_ref, x1_ref),
        ((a >> 4) | (((h >> 4) & 3) << 4), s2_ref, x2_ref),
        ((b >> 4) | (((h >> 6) & 3) << 4), s3_ref, x3_ref),
    )
    acc = None
    for q, s_ref, x_ref in planes:
        w = (q.astype(jnp.float32) - 32.0) * _expand_cols(
            s_ref[...], Q6K_SUB, kq
        )
        part = _dot_t(x_ref[...], w)
        acc = part if acc is None else acc + part
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile"))
def q6k_matmul(
    x: jnp.ndarray,  # [N, K]
    w: Dict[str, jnp.ndarray],  # pack_q6_k output for [M, K] weights
    interpret: bool = False,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    """Returns x @ dequant(W)ᵀ as [N, M] f32."""
    n, k = x.shape
    m, kq = w["ql_a"].shape
    nbq = kq // Q6K_SUB
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    xs = [x[:, i * kq : (i + 1) * kq] for i in range(4)]
    wspec = lambda cols: pl.BlockSpec((m_tile, cols), lambda i, j: (j, 0))
    out = pl.pallas_call(
        _q6k_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((n_tile, kq), lambda i, j: (i, 0))] * 4
        + [wspec(kq), wspec(kq), wspec(kq)]
        + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((n_tile, m_tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(*xs, w["ql_a"], w["ql_b"], w["qh"], w["s0"], w["s1"], w["s2"], w["s3"])
    return out


def q6k_matmul_auto(x, w):
    return q6k_matmul(x, w, interpret=jax.default_backend() != "tpu")


# ---------------------------------------------------------------------------
# layered variants (scalar-prefetch layer index — scan-body safe)
# ---------------------------------------------------------------------------


def _q4k_layered_kernel(
    li_ref, x_lo_ref, x_hi_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref
):
    del li_ref
    packed = p_ref[0].astype(jnp.int32)
    mt, kh = packed.shape
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    w_lo = lo * _expand_cols(sl_ref[0], Q4K_SUB, kh) - _expand_cols(
        bl_ref[0], Q4K_SUB, kh
    )
    w_hi = hi * _expand_cols(sh_ref[0], Q4K_SUB, kh) - _expand_cols(
        bh_ref[0], Q4K_SUB, kh
    )
    out_ref[...] = _dot_t(x_lo_ref[...], w_lo) + _dot_t(x_hi_ref[...], w_hi)


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile"))
def q4k_matmul_layered(
    x: jnp.ndarray,  # [N, K]
    w: Dict[str, jnp.ndarray],  # stacked pack: packed [L, M, K/2], ...
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    """x @ dequant(W[layer])ᵀ with the whole [L, ...] stack resident —
    the layer index rides scalar prefetch so scan bodies avoid XLA
    dynamic-slice copies (see q8_matmul_layered)."""
    n, k = x.shape
    L, m, kh = w["packed"].shape
    nbh = kh // Q4K_SUB
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    x_lo, x_hi = x[:, :kh], x[:, kh:]
    xspec = pl.BlockSpec((n_tile, kh), lambda i, j, li: (i, 0))
    wspec = lambda cols: pl.BlockSpec(
        (1, m_tile, cols), lambda i, j, li: (li[0], j, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[xspec, xspec, wspec(kh), wspec(nbh), wspec(nbh), wspec(nbh), wspec(nbh)],
        out_specs=pl.BlockSpec((n_tile, m_tile), lambda i, j, li: (i, j)),
    )
    return pl.pallas_call(
        _q4k_layered_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"],
    )


def q4k_matmul_layered_auto(x, w, layer):
    return q4k_matmul_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu"
    )


def _q6k_layered_kernel(
    li_ref, x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    del li_ref
    a = qa_ref[0].astype(jnp.int32)
    b = qb_ref[0].astype(jnp.int32)
    h = qh_ref[0].astype(jnp.int32)
    mt, kq = a.shape
    planes = (
        ((a & 0xF) | ((h & 3) << 4), s0_ref, x0_ref),
        ((b & 0xF) | (((h >> 2) & 3) << 4), s1_ref, x1_ref),
        ((a >> 4) | (((h >> 4) & 3) << 4), s2_ref, x2_ref),
        ((b >> 4) | (((h >> 6) & 3) << 4), s3_ref, x3_ref),
    )
    acc = None
    for q, s_ref, x_ref in planes:
        w = (q.astype(jnp.float32) - 32.0) * _expand_cols(s_ref[0], Q6K_SUB, kq)
        part = _dot_t(x_ref[...], w)
        acc = part if acc is None else acc + part
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile", "n_tile"))
def q6k_matmul_layered(
    x: jnp.ndarray,
    w: Dict[str, jnp.ndarray],  # stacked pack: ql_a [L, M, K/4], ...
    layer: jnp.ndarray,
    interpret: bool = False,
    m_tile: int = 256,
    n_tile: int = 256,
) -> jnp.ndarray:
    n, k = x.shape
    L, m, kq = w["ql_a"].shape
    nbq = kq // Q6K_SUB
    m_tile = _pick_tile(m, m_tile, 128)
    n_tile = _pick_tile(n, n_tile, 8)
    grid = (n // n_tile, m // m_tile)
    xs = [x[:, i * kq : (i + 1) * kq] for i in range(4)]
    xspec = pl.BlockSpec((n_tile, kq), lambda i, j, li: (i, 0))
    wspec = lambda cols: pl.BlockSpec(
        (1, m_tile, cols), lambda i, j, li: (li[0], j, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[xspec] * 4
        + [wspec(kq)] * 3
        + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((n_tile, m_tile), lambda i, j, li: (i, j)),
    )
    return pl.pallas_call(
        _q6k_layered_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        *xs, w["ql_a"], w["ql_b"], w["qh"],
        w["s0"], w["s1"], w["s2"], w["s3"],
    )


def q6k_matmul_layered_auto(x, w, layer):
    return q6k_matmul_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu"
    )


# ---------------------------------------------------------------------------
# in-major plane layout for expert stacks (contraction dim = sublanes)
# ---------------------------------------------------------------------------


def pack_q4_k_inmajor(payload: bytes, e: int, o: int, i: int) -> Dict[str, jnp.ndarray]:
    """Per-expert ggml payload (rows = e·o ggml rows of length i) →
    in-major plane dict for the gather kernels:
    packed [e, i/2, o] (lo nibble = contraction row j, hi = j + i/2),
    s_lo/s_hi/b_lo/b_hi [e, i/64, o]."""
    L, s, b = _q4k_decode_payload(payload, e * o, i)
    LT = L.reshape(e, o, i).transpose(0, 2, 1)  # [e, i, o]
    sT = s.reshape(e, o, i // Q4K_SUB).transpose(0, 2, 1)
    bT = b.reshape(e, o, i // Q4K_SUB).transpose(0, 2, 1)
    half = i // 2
    nbh = half // Q4K_SUB
    packed = (LT[:, :half] | (LT[:, half:] << 4)).astype(np.uint8)
    return {
        "packed": jnp.asarray(packed),
        "s_lo": jnp.asarray(sT[:, :nbh]),
        "s_hi": jnp.asarray(sT[:, nbh:]),
        "b_lo": jnp.asarray(bT[:, :nbh]),
        "b_hi": jnp.asarray(bT[:, nbh:]),
    }


def pack_q6_k_inmajor(payload: bytes, e: int, o: int, i: int) -> Dict[str, jnp.ndarray]:
    """Per-expert ggml payload → in-major quarter-plane dict:
    ql_a/ql_b/qh [e, i/4, o], s0..s3 [e, i/64, o]."""
    L, s = _q6k_decode_payload(payload, e * o, i)
    LT = L.reshape(e, o, i).transpose(0, 2, 1)  # [e, i, o]
    sT = s.reshape(e, o, i // Q6K_SUB).transpose(0, 2, 1)  # [e, i/16, o]
    q = i // 4
    Q = [LT[:, j * q : (j + 1) * q] for j in range(4)]
    ql_a = ((Q[0] & 0xF) | ((Q[2] & 0xF) << 4)).astype(np.uint8)
    ql_b = ((Q[1] & 0xF) | ((Q[3] & 0xF) << 4)).astype(np.uint8)
    qh = (
        (Q[0] >> 4) | ((Q[1] >> 4) << 2) | ((Q[2] >> 4) << 4) | ((Q[3] >> 4) << 6)
    ).astype(np.uint8)
    nbq = q // Q6K_SUB
    return {
        "ql_a": jnp.asarray(ql_a),
        "ql_b": jnp.asarray(ql_b),
        "qh": jnp.asarray(qh),
        **{
            f"s{j}": jnp.asarray(sT[:, j * nbq : (j + 1) * nbq]) for j in range(4)
        },
    }


def _row_select(x_ref, ni) -> jnp.ndarray:
    """[1, H] — row ni of x via masked sum (Mosaic-safe dynamic row pick)."""
    n, h = x_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    return jnp.sum(
        jnp.where(row_ids == ni, x_ref[...].astype(jnp.float32), 0),
        axis=0,
        keepdims=True,
    ).astype(jnp.bfloat16)


def _dot_in(x, w):
    """x [1, H] · w [H, T] → [1, T] f32."""
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _q4k_w_planes_inmajor(p, sl, sh, bl, bh):
    """packed [H/2, T] (+ per-32 scales/bias [H/64, T]) → (w_lo, w_hi)."""
    p32 = p.astype(jnp.int32)
    h2 = p32.shape[0]
    lo = (p32 & 0xF).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    w_lo = lo * _expand_rows(sl, Q4K_SUB, h2) - _expand_rows(bl, Q4K_SUB, h2)
    w_hi = hi * _expand_rows(sh, Q4K_SUB, h2) - _expand_rows(bh, Q4K_SUB, h2)
    return w_lo, w_hi


def _q4k_gather_kernel(
    idx_ref, xl_ref, xh_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref
):
    del idx_ref
    ni = pl.program_id(1)
    w_lo, w_hi = _q4k_w_planes_inmajor(
        p_ref[0], sl_ref[0], sh_ref[0], bl_ref[0], bh_ref[0]
    )
    row = _dot_in(_row_select(xl_ref, ni), w_lo) + _dot_in(
        _row_select(xh_ref, ni), w_hi
    )
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


def _q4k_gather_layered_kernel(
    idx_ref, li_ref, xl_ref, xh_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref
):
    del idx_ref, li_ref
    ni = pl.program_id(1)
    w_lo, w_hi = _q4k_w_planes_inmajor(
        p_ref[0, 0], sl_ref[0, 0], sh_ref[0, 0], bl_ref[0, 0], bh_ref[0, 0]
    )
    row = _dot_in(_row_select(xl_ref, ni), w_lo) + _dot_in(
        _row_select(xh_ref, ni), w_hi
    )
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


def _gather_tile(m: int) -> int:
    tile = m if (m % 128 or m <= 512) else 512
    while m % tile:
        tile //= 2
    return tile


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q4k_gather_matmul(
    x: jnp.ndarray,  # [N, H]
    w: Dict[str, jnp.ndarray],  # pack_q4_k_inmajor output [E, ...]
    idx: jnp.ndarray,  # [N] int32
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    """out[n] = x[n] @ dequant(W[idx[n]]) → [N, M] f32 (selected experts'
    quantized tiles only: ~0.56 B/weight of HBM traffic)."""
    n, h = x.shape
    e, h2, m = w["packed"].shape
    nbh = w["s_lo"].shape[1]
    tile = tile or _gather_tile(m)
    grid = (m // tile, n)
    x_lo, x_hi = x[:, :h2], x[:, h2:]
    xspec = pl.BlockSpec((n, h2), lambda ji, ni, idx: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, rows, tile), lambda ji, ni, idx: (idx[ni], 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[xspec, xspec, wspec(h2), wspec(nbh), wspec(nbh), wspec(nbh), wspec(nbh)],
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx: (0, ji)),
    )
    return pl.pallas_call(
        _q4k_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"],
    )


def q4k_gather_matmul_auto(x, w, idx):
    return q4k_gather_matmul(x, w, idx, interpret=jax.default_backend() != "tpu")


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q4k_gather_matmul_layered(
    x: jnp.ndarray,  # [N, H]
    w: Dict[str, jnp.ndarray],  # stacked in-major: packed [L, E, H/2, M], ...
    idx: jnp.ndarray,  # [N]
    layer: jnp.ndarray,  # scalar
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    n, h = x.shape
    L, e, h2, m = w["packed"].shape
    nbh = w["s_lo"].shape[2]
    tile = tile or _gather_tile(m)
    grid = (m // tile, n)
    x_lo, x_hi = x[:, :h2], x[:, h2:]
    xspec = pl.BlockSpec((n, h2), lambda ji, ni, idx, li: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ji, ni, idx, li: (li[0], idx[ni], 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[xspec, xspec, wspec(h2), wspec(nbh), wspec(nbh), wspec(nbh), wspec(nbh)],
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx, li: (0, ji)),
    )
    return pl.pallas_call(
        _q4k_gather_layered_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"],
    )


def q4k_gather_matmul_layered_auto(x, w, idx, layer):
    return q4k_gather_matmul_layered(
        x, w, idx, layer, interpret=jax.default_backend() != "tpu"
    )


def _q6k_w_planes_inmajor(a8, b8, h8, s0, s1, s2, s3):
    """ql_a/ql_b/qh [H/4, T] + per-16 scales [H/64, T] → 4 plane weights."""
    a = a8.astype(jnp.int32)
    b = b8.astype(jnp.int32)
    h = h8.astype(jnp.int32)
    hq = a.shape[0]
    qs = (
        ((a & 0xF) | ((h & 3) << 4), s0),
        ((b & 0xF) | (((h >> 2) & 3) << 4), s1),
        ((a >> 4) | (((h >> 4) & 3) << 4), s2),
        ((b >> 4) | (((h >> 6) & 3) << 4), s3),
    )
    return [
        (q.astype(jnp.float32) - 32.0) * _expand_rows(s, Q6K_SUB, hq)
        for q, s in qs
    ]


def _q6k_gather_kernel(
    idx_ref, x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    del idx_ref
    ni = pl.program_id(1)
    ws = _q6k_w_planes_inmajor(
        qa_ref[0], qb_ref[0], qh_ref[0],
        s0_ref[0], s1_ref[0], s2_ref[0], s3_ref[0],
    )
    row = None
    for x_ref, w in zip((x0_ref, x1_ref, x2_ref, x3_ref), ws):
        part = _dot_in(_row_select(x_ref, ni), w)
        row = part if row is None else row + part
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


def _q6k_gather_layered_kernel(
    idx_ref, li_ref, x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    del idx_ref, li_ref
    ni = pl.program_id(1)
    ws = _q6k_w_planes_inmajor(
        qa_ref[0, 0], qb_ref[0, 0], qh_ref[0, 0],
        s0_ref[0, 0], s1_ref[0, 0], s2_ref[0, 0], s3_ref[0, 0],
    )
    row = None
    for x_ref, w in zip((x0_ref, x1_ref, x2_ref, x3_ref), ws):
        part = _dot_in(_row_select(x_ref, ni), w)
        row = part if row is None else row + part
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[...] = jnp.where(out_rows == ni, row, out_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q6k_gather_matmul(
    x: jnp.ndarray,
    w: Dict[str, jnp.ndarray],  # pack_q6_k_inmajor output [E, ...]
    idx: jnp.ndarray,
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    n, h = x.shape
    e, hq, m = w["ql_a"].shape
    nbq = w["s0"].shape[1]
    tile = tile or _gather_tile(m)
    grid = (m // tile, n)
    xs = [x[:, i * hq : (i + 1) * hq] for i in range(4)]
    xspec = pl.BlockSpec((n, hq), lambda ji, ni, idx: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, rows, tile), lambda ji, ni, idx: (idx[ni], 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[xspec] * 4 + [wspec(hq)] * 3 + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx: (0, ji)),
    )
    return pl.pallas_call(
        _q6k_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        *xs, w["ql_a"], w["ql_b"], w["qh"],
        w["s0"], w["s1"], w["s2"], w["s3"],
    )


def q6k_gather_matmul_auto(x, w, idx):
    return q6k_gather_matmul(x, w, idx, interpret=jax.default_backend() != "tpu")


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q6k_gather_matmul_layered(
    x: jnp.ndarray,
    w: Dict[str, jnp.ndarray],  # stacked in-major: ql_a [L, E, H/4, M], ...
    idx: jnp.ndarray,
    layer: jnp.ndarray,
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    n, h = x.shape
    L, e, hq, m = w["ql_a"].shape
    nbq = w["s0"].shape[2]
    tile = tile or _gather_tile(m)
    grid = (m // tile, n)
    xs = [x[:, i * hq : (i + 1) * hq] for i in range(4)]
    xspec = pl.BlockSpec((n, hq), lambda ji, ni, idx, li: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ji, ni, idx, li: (li[0], idx[ni], 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[xspec] * 4 + [wspec(hq)] * 3 + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((n, tile), lambda ji, ni, idx, li: (0, ji)),
    )
    return pl.pallas_call(
        _q6k_gather_layered_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        *xs, w["ql_a"], w["ql_b"], w["qh"],
        w["s0"], w["s1"], w["s2"], w["s3"],
    )


def q6k_gather_matmul_layered_auto(x, w, idx, layer):
    return q6k_gather_matmul_layered(
        x, w, idx, layer, interpret=jax.default_backend() != "tpu"
    )


# ---------------------------------------------------------------------------
# Dense ALL-expert k-quant matmuls (high-occupancy decode)
#
# Same strategy as dequant_matmul's q8 dense sweep: once N*top_k exceeds
# n_experts, the gather kernels re-stream shared experts, so reading
# EVERY expert exactly once moves fewer bytes — and Q4_K does it at 0.75
# bytes/weight (Q6_K ~1.06) vs Q8_0's ~1.13. Output is [E, N, M] for the
# caller's take_along_axis combine.
# ---------------------------------------------------------------------------


def _q4k_dense_kernel(
    li_ref, xl_ref, xh_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref
):
    del li_ref
    w_lo, w_hi = _q4k_w_planes_inmajor(
        p_ref[0, 0], sl_ref[0, 0], sh_ref[0, 0], bl_ref[0, 0], bh_ref[0, 0]
    )
    out_ref[0] = _dot_in(xl_ref[...], w_lo) + _dot_in(xh_ref[...], w_hi)


def _q4k_dense_perx_kernel(
    li_ref, xl_ref, xh_ref, p_ref, sl_ref, sh_ref, bl_ref, bh_ref, out_ref
):
    del li_ref
    w_lo, w_hi = _q4k_w_planes_inmajor(
        p_ref[0, 0], sl_ref[0, 0], sh_ref[0, 0], bl_ref[0, 0], bh_ref[0, 0]
    )
    out_ref[0] = _dot_in(xl_ref[0], w_lo) + _dot_in(xh_ref[0], w_hi)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q4k_dense_experts_layered(
    x: jnp.ndarray,  # [N, H] — shared across experts (gate/up input)
    w: Dict[str, jnp.ndarray],  # stacked in-major: packed [L, E, H/2, M], ...
    layer: jnp.ndarray,  # scalar int32
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x @ dequant(W[layer, e]) → [E, N, M] f32."""
    n, h = x.shape
    L, e, h2, m = w["packed"].shape
    nbh = w["s_lo"].shape[2]
    tile = tile or _gather_tile(m)
    x_lo, x_hi = x[:, :h2], x[:, h2:]
    xspec = pl.BlockSpec((n, h2), lambda ei, ji, li: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[xspec, xspec, wspec(h2), wspec(nbh), wspec(nbh), wspec(nbh), wspec(nbh)],
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        _q4k_dense_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"],
    )



def _dense_tile_env(m: int) -> int:
    """Out-tile for the dense all-expert k-quant kernels (VERDICT r4
    #6): _gather_tile's 128 runs the plane decode in many small grid
    cells; the r5 TPU sweep measured the widest 128-aligned divisor
    (896 at m=1792) at 8.88 vs 9.86 ms/step @16 rows
    (bench_logs/r5/attr_q4k_tile*.log). Default: largest divisor of m
    that is a multiple of 128 and ≤896 (keeps decoded bf16 planes well
    under VMEM at DeepSeek geometry). DSOCR_KQ_DENSE_TILE overrides;
    invalid values (non-dividing or not 128-aligned) fall back."""
    import os

    t = int(os.environ.get("DSOCR_KQ_DENSE_TILE", "0"))
    if t and m % t == 0 and t % 128 == 0:
        return t
    best = 0
    for cand in range(128, min(m, 896) + 1, 128):
        if m % cand == 0:
            best = cand
    return best


def q4k_dense_experts_layered_auto(x, w, layer):
    return q4k_dense_experts_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu",
        tile=_dense_tile_env(w["packed"].shape[-1]),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q4k_dense_experts_perx_layered(
    x: jnp.ndarray,  # [E, N, K] — per-expert input (down projection)
    w: Dict[str, jnp.ndarray],  # stacked in-major: packed [L, E, K/2, M], ...
    layer: jnp.ndarray,
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x[e] @ dequant(W[layer, e]) → [E, N, M] f32."""
    e, n, k = x.shape
    L, _, k2, m = w["packed"].shape
    nbh = w["s_lo"].shape[2]
    tile = tile or _gather_tile(m)
    x_lo, x_hi = x[:, :, :k2], x[:, :, k2:]
    xspec = pl.BlockSpec((1, n, k2), lambda ei, ji, li: (ei, 0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[xspec, xspec, wspec(k2), wspec(nbh), wspec(nbh), wspec(nbh), wspec(nbh)],
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        _q4k_dense_perx_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x_lo, x_hi, w["packed"], w["s_lo"], w["s_hi"], w["b_lo"], w["b_hi"],
    )


def q4k_dense_experts_perx_layered_auto(x, w, layer):
    return q4k_dense_experts_perx_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu",
        tile=_dense_tile_env(w["packed"].shape[-1]),
    )


def _q6k_dense_kernel(
    li_ref, x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    del li_ref
    ws = _q6k_w_planes_inmajor(
        qa_ref[0, 0], qb_ref[0, 0], qh_ref[0, 0],
        s0_ref[0, 0], s1_ref[0, 0], s2_ref[0, 0], s3_ref[0, 0],
    )
    acc = None
    for x_ref, w_p in zip((x0_ref, x1_ref, x2_ref, x3_ref), ws):
        part = _dot_in(x_ref[...], w_p)
        acc = part if acc is None else acc + part
    out_ref[0] = acc


def _q6k_dense_perx_kernel(
    li_ref, x0_ref, x1_ref, x2_ref, x3_ref,
    qa_ref, qb_ref, qh_ref, s0_ref, s1_ref, s2_ref, s3_ref, out_ref,
):
    del li_ref
    ws = _q6k_w_planes_inmajor(
        qa_ref[0, 0], qb_ref[0, 0], qh_ref[0, 0],
        s0_ref[0, 0], s1_ref[0, 0], s2_ref[0, 0], s3_ref[0, 0],
    )
    acc = None
    for x_ref, w_p in zip((x0_ref, x1_ref, x2_ref, x3_ref), ws):
        part = _dot_in(x_ref[0], w_p)
        acc = part if acc is None else acc + part
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q6k_dense_experts_layered(
    x: jnp.ndarray,  # [N, H]
    w: Dict[str, jnp.ndarray],  # stacked in-major: ql_a [L, E, H/4, M], ...
    layer: jnp.ndarray,
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x @ dequant(W[layer, e]) → [E, N, M] f32."""
    n, h = x.shape
    L, e, hq, m = w["ql_a"].shape
    nbq = w["s0"].shape[2]
    tile = tile or _gather_tile(m)
    xs = [x[:, i * hq : (i + 1) * hq] for i in range(4)]
    xspec = pl.BlockSpec((n, hq), lambda ei, ji, li: (0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[xspec] * 4 + [wspec(hq)] * 3 + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        _q6k_dense_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        *xs, w["ql_a"], w["ql_b"], w["qh"],
        w["s0"], w["s1"], w["s2"], w["s3"],
    )


def q6k_dense_experts_layered_auto(x, w, layer):
    return q6k_dense_experts_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu",
        tile=_dense_tile_env(w["ql_a"].shape[-1]),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def q6k_dense_experts_perx_layered(
    x: jnp.ndarray,  # [E, N, K]
    w: Dict[str, jnp.ndarray],  # stacked in-major: ql_a [L, E, K/4, M], ...
    layer: jnp.ndarray,
    interpret: bool = False,
    tile: int = 0,
) -> jnp.ndarray:
    """out[e] = x[e] @ dequant(W[layer, e]) → [E, N, M] f32."""
    e, n, k = x.shape
    L, _, kq, m = w["ql_a"].shape
    nbq = w["s0"].shape[2]
    tile = tile or _gather_tile(m)
    xs = [x[:, :, i * kq : (i + 1) * kq] for i in range(4)]
    xspec = pl.BlockSpec((1, n, kq), lambda ei, ji, li: (ei, 0, 0))
    wspec = lambda rows: pl.BlockSpec(
        (1, 1, rows, tile), lambda ei, ji, li: (li[0], ei, 0, ji)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, m // tile),
        in_specs=[xspec] * 4 + [wspec(kq)] * 3 + [wspec(nbq)] * 4,
        out_specs=pl.BlockSpec((1, n, tile), lambda ei, ji, li: (ei, 0, ji)),
    )
    return pl.pallas_call(
        _q6k_dense_perx_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, n, m), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        *xs, w["ql_a"], w["ql_b"], w["qh"],
        w["s0"], w["s1"], w["s2"], w["s3"],
    )


def q6k_dense_experts_perx_layered_auto(x, w, layer):
    return q6k_dense_experts_perx_layered(
        x, w, layer, interpret=jax.default_backend() != "tpu",
        tile=_dense_tile_env(w["ql_a"].shape[-1]),
    )


# ---------------------------------------------------------------------------
# XLA-level dequant of plane-packed stacks (prefill path: dequantize once
# per layer, then dense/ragged grouped matmuls)
# ---------------------------------------------------------------------------


def dequant_q4k_planes(w: Dict[str, jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Plane-packed Q4_K dict → bf16 full weights. `axis` is the packed
    (contraction-split) dimension: -1 for row-major [..., M, K/2] plain
    linears, -2 for in-major [..., K/2, M] expert stacks."""
    packed = w["packed"].astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    sub = Q4K_SUB

    def expand(s):
        return jnp.repeat(s, sub, axis=axis)

    w_lo = lo * expand(w["s_lo"]) - expand(w["b_lo"])
    w_hi = hi * expand(w["s_hi"]) - expand(w["b_hi"])
    return jnp.concatenate([w_lo, w_hi], axis=axis).astype(jnp.bfloat16)


def dequant_q6k_planes(w: Dict[str, jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Plane-packed Q6_K dict → bf16 full weights (`axis` as above)."""
    a = w["ql_a"].astype(jnp.int32)
    b = w["ql_b"].astype(jnp.int32)
    h = w["qh"].astype(jnp.int32)
    sub = Q6K_SUB

    def plane(q, s):
        return (q.astype(jnp.float32) - 32.0) * jnp.repeat(s, sub, axis=axis)

    parts = [
        plane((a & 0xF) | ((h & 3) << 4), w["s0"]),
        plane((b & 0xF) | (((h >> 2) & 3) << 4), w["s1"]),
        plane((a >> 4) | (((h >> 4) & 3) << 4), w["s2"]),
        plane((b >> 4) | ((h >> 6) << 4), w["s3"]),
    ]
    return jnp.concatenate(parts, axis=axis).astype(jnp.bfloat16)
