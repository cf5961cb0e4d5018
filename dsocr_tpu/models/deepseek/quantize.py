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


def _effective_method(method: str, in_dim: int) -> str:
    """k-quants need 256-element super-blocks along the contraction dim;
    ineligible tensors fall back to Q8_0 (the reference's exporter falls
    back to float for them — Q8_0 is the strictly better TPU fallback)."""
    if method in ("q4_k", "q6_k") and in_dim % 256 != 0:
        return "q8_0"
    return method


def quantize_plain(w, method: str = "q8_0") -> Dict:
    """[.., in, out] float → packed quant dict in ggml row layout
    (q8_0: {codes [.., out, in]}; q4_k/q6_k: plane dicts, kquant_matmul)."""
    arr = np.asarray(w, np.float32)
    *lead, i, o = arr.shape
    method = _effective_method(method, i)
    rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
    if method == "q8_0":
        codes, scales = _q8_rows(rows)
        return {
            "codes": jnp.asarray(codes.reshape(*lead, o, i)),
            "scales": jnp.asarray(scales.reshape(*lead, o, i // 32)),
        }
    from ...dsq.quant import quantize_q4_k, quantize_q6_k
    from ...ops.pallas.kquant_matmul import pack_q4_k, pack_q6_k

    r = rows.shape[0]
    if method == "q4_k":
        packed = pack_q4_k(quantize_q4_k(rows, r, i), r, i)
    else:
        packed = pack_q6_k(quantize_q6_k(rows, r, i), r, i)
    return {
        key: jnp.asarray(np.asarray(v).reshape(*lead, o, *v.shape[1:]))
        for key, v in packed.items()
    }


def quantize_expert_stack(w, method: str = "q8_0") -> Dict:
    """[L, E, in, out] float → in-major packed dict (see module docstring)."""
    arr = np.asarray(w, np.float32)
    L, E, i, o = arr.shape
    method = _effective_method(method, i)
    if method == "q8_0":
        codes_out = np.empty((L, E, i, o), np.int8)
        scales_out = np.empty((L, E, i // 32, o), np.float32)
        for l in range(L):  # per-layer to bound the f32 working set
            rows = arr[l].transpose(0, 2, 1).reshape(-1, i)  # [E*o, in] ggml rows
            codes, scales = _q8_rows(rows)
            codes_out[l] = codes.reshape(E, o, i).transpose(0, 2, 1)
            scales_out[l] = scales.reshape(E, o, i // 32).transpose(0, 2, 1)
        return {"codes": jnp.asarray(codes_out), "scales": jnp.asarray(scales_out)}
    from ...dsq.quant import quantize_q4_k, quantize_q6_k
    from ...ops.pallas.kquant_matmul import pack_q4_k_inmajor, pack_q6_k_inmajor

    per_layer = []
    for l in range(L):
        rows = arr[l].transpose(0, 2, 1).reshape(-1, i)
        if method == "q4_k":
            per_layer.append(pack_q4_k_inmajor(quantize_q4_k(rows, E * o, i), E, o, i))
        else:
            per_layer.append(pack_q6_k_inmajor(quantize_q6_k(rows, E * o, i), E, o, i))
    return {
        key: jnp.stack([np.asarray(p[key]) for p in per_layer])
        for key in per_layer[0]
    }


def quantize_decoder_params(params: Dict, method: str = "q8_0") -> Dict:
    """Return a copy of the decoder param tree with the reference's
    quantization-eligible linears replaced by packed quant dicts
    (q8_0 / q4_k / q6_k; k-quant-ineligible in-dims fall back to q8_0)."""
    if method not in ("q8_0", "q4_k", "q6_k"):
        raise NotImplementedError(
            f"runtime quantization `{method}` not supported"
        )
    out = dict(params)
    if "lm_head" in out and out["lm_head"] is not None:
        out["lm_head"] = quantize_plain(out["lm_head"], method)
    for group in ("dense_layers", "moe_layers"):
        if group not in out:
            continue
        layers = dict(out[group])
        for key in PLAIN_KEYS:
            if key in layers:
                layers[key] = quantize_plain(layers[key], method)
        for key in EXPERT_KEYS:
            if key in layers:
                layers[key] = quantize_expert_stack(layers[key], method)
        out[group] = layers
    return out
