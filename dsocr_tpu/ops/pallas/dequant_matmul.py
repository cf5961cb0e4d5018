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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q8_BLOCK = 32


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


def _kernel(x_ref, q_ref, s_ref, out_ref):
    q = q_ref[...].astype(jnp.float32)  # [MT, K]
    s = s_ref[...]  # [MT, K // 32]
    mt, k = q.shape
    nb = k // Q8_BLOCK
    # Expand block scales across their 32 columns via a 0/1 expansion
    # matmul (Mosaic rejects repeat/reshape across the lane dim).
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    expand = (cols // Q8_BLOCK == rows).astype(jnp.float32)
    s_full = jax.lax.dot_general(
        s, expand,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = q * s_full
    out_ref[...] = jax.lax.dot_general(
        x_ref[...].astype(jnp.float32),
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile"))
def q8_matmul(
    x: jnp.ndarray,  # [N, K]
    codes: jnp.ndarray,  # [M, K] int8
    scales: jnp.ndarray,  # [M, K/32] f32
    interpret: bool = False,
    m_tile: int = 256,
) -> jnp.ndarray:
    """Returns x @ dequant(W)^T as [N, M] f32."""
    n, k = x.shape
    m = codes.shape[0]
    m_tile = min(m_tile, m)
    while m % m_tile:
        m_tile //= 2
    grid = (m // m_tile,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, k // Q8_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(x, codes, scales)
    return out


def q8_matmul_auto(x, codes, scales):
    """Pallas on TPU, interpreter elsewhere (CPU tests)."""
    return q8_matmul(x, codes, scales, interpret=jax.default_backend() != "tpu")
