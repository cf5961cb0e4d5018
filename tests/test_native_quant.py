"""Native C++ ggml quantizers vs the NumPy spec: BYTE equality.

The C++ kernels replicate NumPy's pairwise-summation order inside the
iterative scale searches (make_qx_quants / make_qkx2_quants), so the
payloads must match bit-for-bit — not just numerically — on random and
adversarial inputs (zero blocks, flat blocks, exact ties, huge/small
magnitudes). Skips when g++ is unavailable."""

import numpy as np
import pytest

from dsocr_tpu.dsq.quant import (
    dequantize,
    quantize_q4_k,
    quantize_q6_k,
    quantize_q8_0,
)
from dsocr_tpu.native import quant_native_available, quantize_native

pytestmark = pytest.mark.skipif(
    not quant_native_available(), reason="native toolchain unavailable"
)

_NUMPY = {"q8_0": quantize_q8_0, "q4_k": quantize_q4_k, "q6_k": quantize_q6_k}


def _cases(rng, cols):
    rows = 6
    base = rng.normal(size=(rows, cols)).astype(np.float32)
    cases = {
        "normal": base,
        "scaled_up": base * 1e4,
        "scaled_down": base * 1e-6,
        "zero_rows": np.zeros((rows, cols), np.float32),
        "flat_positive": np.full((rows, cols), 0.37, np.float32),
        "flat_negative": np.full((rows, cols), -1.5, np.float32),
        "single_spike": np.zeros((rows, cols), np.float32),
    }
    cases["single_spike"][:, 7] = 3.0
    ties = base.copy()
    ties[:, : cols // 2] = 2.5  # exercises rounding edges
    cases["ties"] = ties
    mixed = base.copy()
    mixed[1] = 0
    mixed[3] = np.abs(mixed[3])  # all-positive rows (qkx2 vmin clamp)
    cases["mixed"] = mixed
    return cases


@pytest.mark.parametrize("method,cols", [
    ("q8_0", 96), ("q8_0", 32), ("q4_k", 256), ("q4_k", 512),
    ("q6_k", 256), ("q6_k", 512),
])
def test_native_payload_matches_numpy(method, cols):
    rng = np.random.default_rng(hash((method, cols)) % 2**32)
    for name, x in _cases(rng, cols).items():
        ref = _NUMPY[method](x, x.shape[0], cols)
        native = quantize_native(method, x, x.shape[0], cols)
        assert native == ref, f"{method}/{name}: payload bytes differ"


@pytest.mark.parametrize("method,cols", [("q4_k", 256), ("q6_k", 256)])
def test_native_dequantizes_accurately(method, cols):
    """Sanity beyond byte equality: the payload reconstructs the input."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, cols)).astype(np.float32)
    payload = quantize_native(method, x, 4, cols)
    deq = dequantize(method.upper(), payload, 4, cols)
    assert np.corrcoef(deq.ravel(), x.ravel())[0, 1] > 0.98


def test_dispatch_prefers_native(monkeypatch):
    """dsq.quant.quantize routes through the native kernel by default and
    falls back to NumPy under DSOCR_NO_NATIVE=1 with identical bytes."""
    import dsocr_tpu.dsq.quant as q

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 256)).astype(np.float32)
    native = q.quantize("Q6_K", x, 2, 256)
    monkeypatch.setenv("DSOCR_NO_NATIVE", "1")
    numpy_payload = q.quantize("Q6_K", x, 2, 256)
    assert native == numpy_payload
