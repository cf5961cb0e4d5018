"""Pallas Q8_0 dequant-matmul vs NumPy dequantize reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.dsq.quant import dequantize_q8_0, quantize_q8_0
from dsocr_tpu.ops.pallas.dequant_matmul import pack_q8_0, q8_matmul_auto


@pytest.mark.parametrize("n,m,k", [(1, 64, 128), (4, 128, 256), (2, 96, 64)])
def test_q8_matmul_matches_dequant_reference(n, m, k):
    rng = np.random.default_rng(n * m + k)
    w = (rng.normal(size=(m, k)) * 0.5).astype(np.float32)
    x = rng.normal(size=(n, k)).astype(np.float32)
    payload = quantize_q8_0(w, m, k)
    codes, scales = pack_q8_0(payload, m, k)
    out = np.asarray(q8_matmul_auto(jnp.asarray(x), codes, scales))
    expected = x @ dequantize_q8_0(payload, m, k).T
    # kernel runs the dot in bf16 (MXU); tolerance covers bf16 rounding
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_pack_q8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    payload = quantize_q8_0(w, 8, 64)
    codes, scales = pack_q8_0(payload, 8, 64)
    deq = np.asarray(codes, np.float32) * np.repeat(np.asarray(scales), 32, axis=1)
    np.testing.assert_allclose(deq, dequantize_q8_0(payload, 8, 64), rtol=1e-6)


def test_q8_gather_matmul_matches_reference():
    from dsocr_tpu.ops.pallas.dequant_matmul import q8_gather_matmul_auto

    rng = np.random.default_rng(5)
    E, H, M, N = 5, 64, 48, 7
    w = rng.normal(size=(E, M, H)).astype(np.float32)  # ggml [out, in] rows
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, H)).astype(np.float32)

    codes_list, scales_list, deq = [], [], []
    for e in range(E):
        payload = quantize_q8_0(w[e], M, H)
        c, s = pack_q8_0(payload, M, H)
        codes_list.append(np.asarray(c).T)  # → [H, M] in-major
        scales_list.append(np.asarray(s).T)  # → [H/32, M]
        deq.append(dequantize_q8_0(payload, M, H))
    codes = jnp.asarray(np.stack(codes_list))
    scales = jnp.asarray(np.stack(scales_list))

    out = np.asarray(q8_gather_matmul_auto(jnp.asarray(x), codes, scales, jnp.asarray(idx)))
    expected = np.stack([x[n] @ deq[idx[n]].T for n in range(N)])
    # kernel runs the dot in bf16 (MXU); tolerance covers bf16 rounding
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_q8_requantize_roundtrip_bit_exact():
    """quantize(dequantize(q8_payload)) reproduces the original codes and
    scales bit-for-bit: the amax element always maps to ±127, so the f16
    scale round-trips exactly. This makes serving a Q8_0 snapshot via
    runtime re-quantization equivalent to keeping the packed records."""
    from dsocr_tpu.models.deepseek.quantize import quantize_plain

    rng = np.random.default_rng(11)
    M, K = 16, 96
    w = (rng.normal(size=(M, K)) * rng.uniform(0.01, 3.0, size=(M, 1))).astype(
        np.float32
    )
    w[3] = 0.0  # zero block path
    payload = quantize_q8_0(w, M, K)
    codes0, scales0 = pack_q8_0(payload, M, K)
    deq = dequantize_q8_0(payload, M, K)  # [M, K] floats, layout [out, in]

    q = quantize_plain(deq.T)  # quantize_plain takes [in, out]
    np.testing.assert_array_equal(np.asarray(q["codes"]), np.asarray(codes0))
    np.testing.assert_array_equal(np.asarray(q["scales"]), np.asarray(scales0))
