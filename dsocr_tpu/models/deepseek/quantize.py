"""Runtime Q8_0 quantization of the DeepSeek decoder for quantized serving.

The reference's quantized variants keep ggml-packed weights resident and
dequantize inside QMatMul at matmul time (dsq-runtime SnapshotLinear →
candle QMatMul; linear selection per the deepseek adapter,
dsq-models/src/adapters/deepseek_ocr.rs:66-121: attention q/k/v/o, MLP
gate/up/down, routed + shared experts, lm_head). TPU equivalent: weights
stay as int8 codes + f16-derived block scales in HBM and the Pallas
dequant-matmul kernels (ops/pallas/dequant_matmul.py) stream the
quantized bytes — the decode path is HBM-bound, so Q8 is ~2x decode.

Layouts:
  plain linears → {codes [.., out, in] int8, scales [.., out, in/32]}
    (ggml row layout; consumed by q8_matmul)
  expert stacks → {codes [L, E, in, out], scales [L, E, in/32, out]}
    (in-major; consumed by q8_gather_matmul and by the prefill
    dequant-to-bf16 + ragged_dot path without any transpose)

Router gate weights, norms, and embed_tokens stay float (the reference
keeps the router f32 too — gating parity gates routing).

Snapshot parity: re-quantizing a dequantized Q8_0 payload is BIT-EXACT
(the amax element always maps to ±127 so the f16 scale round-trips;
verified in tests/test_dequant_matmul.py), so loading a published .dsq
through the dequantize-on-load reader and re-packing here serves the
identical numbers the reference's QMatMul sees.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ...dsq.quant import quantize_q8_0
from ...ops.pallas.dequant_matmul import pack_q8_0

# The dense-prefix MLP (gate/up/down_proj, intermediate 6848) is left
# float: 6848 is not lane-aligned and its VMEM working set does not fit
# the dequant kernel; it is one layer (~5% of per-step weight bytes).
PLAIN_KEYS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "qkv_proj",
    "o_proj",
    "shared_gate",
    "shared_up",
    "shared_gateup",
    "shared_down",
)
EXPERT_KEYS = ("experts_gate", "experts_up", "experts_gateup", "experts_down")


def _q8_rows(rows: np.ndarray):
    """[R, K] f32 → (codes [R, K] int8, scales [R, K/32] f32) via the
    byte-exact ggml Q8_0 quantizer."""
    r, k = rows.shape
    payload = quantize_q8_0(rows, r, k)
    codes, scales = pack_q8_0(payload, r, k)
    return np.asarray(codes), np.asarray(scales)


def quantize_plain(w) -> Dict:
    """[.., in, out] float → ggml-layout q8 dict {codes [.., out, in]}."""
    arr = np.asarray(w, np.float32)
    *lead, i, o = arr.shape
    rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
    codes, scales = _q8_rows(rows)
    return {
        "codes": jnp.asarray(codes.reshape(*lead, o, i)),
        "scales": jnp.asarray(scales.reshape(*lead, o, i // 32)),
    }


def quantize_expert_stack(w) -> Dict:
    """[L, E, in, out] float → in-major q8 dict (see module docstring)."""
    arr = np.asarray(w, np.float32)
    L, E, i, o = arr.shape
    codes_out = np.empty((L, E, i, o), np.int8)
    scales_out = np.empty((L, E, i // 32, o), np.float32)
    for l in range(L):  # per-layer to bound the f32 working set
        rows = arr[l].transpose(0, 2, 1).reshape(-1, i)  # [E*o, in] ggml rows
        codes, scales = _q8_rows(rows)
        codes_out[l] = codes.reshape(E, o, i).transpose(0, 2, 1)
        scales_out[l] = scales.reshape(E, o, i // 32).transpose(0, 2, 1)
    return {"codes": jnp.asarray(codes_out), "scales": jnp.asarray(scales_out)}


def quantize_decoder_params(params: Dict, method: str = "q8_0") -> Dict:
    """Return a copy of the decoder param tree with the reference's
    quantization-eligible linears replaced by packed q8 dicts."""
    if method != "q8_0":
        raise NotImplementedError(
            f"runtime quantization `{method}` not supported (q8_0 only; "
            "q4_k/q6_k snapshots dequantize on load)"
        )
    out = dict(params)
    if "lm_head" in out and out["lm_head"] is not None:
        out["lm_head"] = quantize_plain(out["lm_head"])
    for group in ("dense_layers", "moe_layers"):
        if group not in out:
            continue
        layers = dict(out[group])
        for key in PLAIN_KEYS:
            if key in layers:
                layers[key] = quantize_plain(layers[key])
        for key in EXPERT_KEYS:
            if key in layers:
                layers[key] = quantize_expert_stack(layers[key])
        out[group] = layers
    return out
