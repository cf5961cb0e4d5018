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
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_pack_q8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    payload = quantize_q8_0(w, 8, 64)
    codes, scales = pack_q8_0(payload, 8, 64)
    deq = np.asarray(codes, np.float32) * np.repeat(np.asarray(scales), 32, axis=1)
    np.testing.assert_allclose(deq, dequantize_q8_0(payload, 8, 64), rtol=1e-6)
