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
    """[R, K] f32 → (codes [R, K] int8, scales [R, K/32] f32).

    Same math as quantize_q8_0 → pack_q8_0 (verified byte-identical in
    tests) without materializing the interleaved payload — the bytes
    round trip dominated host quantization time on 3B models. Codes use
    the f32 scale's inverse; the RETURNED scale is the f16-stored value
    (what dequantize reads), exactly like the payload path."""
    import os

    r, k = rows.shape
    if os.environ.get("DSOCR_NO_NATIVE") != "1":
        from ...native import quantize_native

        payload = quantize_native(
            "q8_0", np.ascontiguousarray(rows, np.float32), r, k
        )
        if payload is not None:
            codes, scales = pack_q8_0(payload, r, k)
            return np.asarray(codes), np.asarray(scales)
    x = np.ascontiguousarray(rows, np.float32).reshape(r, k // 32, 32)
    amax = np.abs(x).max(axis=2)
    scale = np.where(amax > 0.0, amax / 127.0, 0.0).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(scale != 0.0, 1.0 / np.where(scale == 0.0, 1.0, scale), 0.0)
    t = x * inv[..., None]
    # Rust f32::round = ties away from zero (dsq-writer lib.rs:592)
    q = np.clip(
        np.where(t >= 0.0, np.floor(t + 0.5), np.ceil(t - 0.5)), -128, 127
    ).astype(np.int8)
    q = np.where(scale[..., None] == 0.0, np.int8(0), q)
    return q.reshape(r, k), scale.astype(np.float16).astype(np.float32)


def _effective_method(method: str, in_dim: int) -> str:
    """k-quants need 256-element super-blocks along the contraction dim;
    ineligible tensors fall back to Q8_0 (the reference's exporter falls
    back to float for them — Q8_0 is the strictly better TPU fallback)."""
    if method in ("q4_k", "q6_k") and in_dim % 256 != 0:
        return "q8_0"
    return method


_PAYLOAD_BYTES_PER_ROW = {  # ggml block bytes per weight row of length i
    "q8_0": lambda i: (i // 32) * 34,
    "q4_k": lambda i: (i // 256) * 144,
    "q6_k": lambda i: (i // 256) * 210,
}


def _raw_payload_for(raw, method: str, rows: int, i: int):
    """Concatenated raw payload bytes when the snapshot's dtype matches
    the requested effective method and the byte count checks out."""
    if raw is None or raw.get("method") != method:
        return None
    flat = []
    for layer in raw["layers"]:
        flat.extend(layer if isinstance(layer, list) else [layer])
    payload = b"".join(bytes(p) for p in flat)
    if len(payload) != rows * _PAYLOAD_BYTES_PER_ROW[method](i):
        return None
    return payload


def quantize_plain(w, method: str = "q8_0", raw=None) -> Dict:
    """[.., in, out] float → packed quant dict in ggml row layout
    (q8_0: {codes [.., out, in]}; q4_k/q6_k: plane dicts, kquant_matmul).

    `raw` (collect_raw_quant entry) short-circuits the quantizer with the
    snapshot's published payload — bit-identical to the reference's
    QMatMul input; required for k-quants where requantize(dequantize) is
    not exact. in_dims not divisible by the Q8_0 block stay float (the
    reference exporter's fallback, dsq-writer lib.rs)."""
    arr = np.asarray(w, np.float32)
    *lead, i, o = arr.shape
    if i % 32:
        return w  # not block-eligible at all → float serving
    method = _effective_method(method, i)
    rows_n = int(np.prod(lead, dtype=np.int64)) * o if lead else o
    payload = _raw_payload_for(raw, method, rows_n, i)
    if method == "q8_0":
        if payload is not None:
            codes, scales = pack_q8_0(payload, rows_n, i)
            codes, scales = np.asarray(codes), np.asarray(scales)
        else:
            rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
            codes, scales = _q8_rows(rows)
        return {
            "codes": jnp.asarray(codes.reshape(*lead, o, i)),
            "scales": jnp.asarray(scales.reshape(*lead, o, i // 32)),
        }
    from ...dsq.quant import quantize as ggml_quantize
    from ...ops.pallas.kquant_matmul import pack_q4_k, pack_q6_k

    if payload is None:
        rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
        payload = ggml_quantize(method.upper(), rows, rows_n, i)
    packed = (pack_q4_k if method == "q4_k" else pack_q6_k)(payload, rows_n, i)
    return {
        key: jnp.asarray(np.asarray(v).reshape(*lead, o, *v.shape[1:]))
        for key, v in packed.items()
    }


def quantize_expert_stack(w, method: str = "q8_0", raw=None) -> Dict:
    """[L, E, in, out] float → in-major packed dict (see module docstring).
    `raw["layers"][l]` = per-expert payload list for layer l (published
    snapshot bytes; see quantize_plain)."""
    arr = np.asarray(w, np.float32)
    L, E, i, o = arr.shape
    if i % 32:
        return w  # not block-eligible at all → float serving
    method = _effective_method(method, i)

    def layer_payload(l):
        if raw is None or raw.get("method") != method:
            return None
        payload = b"".join(bytes(p) for p in raw["layers"][l])
        if len(payload) != E * o * _PAYLOAD_BYTES_PER_ROW[method](i):
            return None
        return payload

    if method == "q8_0":
        codes_out = np.empty((L, E, i, o), np.int8)
        scales_out = np.empty((L, E, i // 32, o), np.float32)
        for l in range(L):  # per-layer to bound the f32 working set
            payload = layer_payload(l)
            if payload is not None:
                codes, scales = pack_q8_0(payload, E * o, i)
                codes, scales = np.asarray(codes), np.asarray(scales)
            else:
                rows = arr[l].transpose(0, 2, 1).reshape(-1, i)  # [E*o, in]
                codes, scales = _q8_rows(rows)
            codes_out[l] = codes.reshape(E, o, i).transpose(0, 2, 1)
            scales_out[l] = scales.reshape(E, o, i // 32).transpose(0, 2, 1)
        return {"codes": jnp.asarray(codes_out), "scales": jnp.asarray(scales_out)}
    from ...dsq.quant import quantize as ggml_quantize
    from ...ops.pallas.kquant_matmul import pack_q4_k_inmajor, pack_q6_k_inmajor

    per_layer = []
    for l in range(L):
        payload = layer_payload(l)
        if payload is None:
            rows = arr[l].transpose(0, 2, 1).reshape(-1, i)
            payload = ggml_quantize(method.upper(), rows, E * o, i)
        per_layer.append(
            (pack_q4_k_inmajor if method == "q4_k" else pack_q6_k_inmajor)(
                payload, E, o, i
            )
        )
    return {
        key: jnp.stack([np.asarray(p[key]) for p in per_layer])
        for key in per_layer[0]
    }


# engine-init fusion concatenates along the OUT dim, so the fused ggml
# payload is the parts' payloads concatenated in fuse order (per layer;
# per expert for expert stacks)
_FUSED_FROM = {
    "qkv_proj": ("q_proj", "k_proj", "v_proj"),
    "shared_gateup": ("shared_gate", "shared_up"),
    "experts_gateup": ("experts_gate", "experts_up"),
}


def _raw_for(raw: Dict, group: str, key: str):
    ent = raw.get((group, key))
    if ent is not None:
        return ent
    parts_keys = _FUSED_FROM.get(key)
    if parts_keys is None:
        return None
    parts = [raw.get((group, k)) for k in parts_keys]
    if any(p is None for p in parts):
        return None
    if len({p["method"] for p in parts}) != 1:
        return None
    layers = []
    for l in range(len(parts[0]["layers"])):
        if isinstance(parts[0]["layers"][l], list):  # per-expert nesting
            layers.append([
                b"".join(bytes(p["layers"][l][e]) for p in parts)
                for e in range(len(parts[0]["layers"][l]))
            ])
        else:
            layers.append(b"".join(bytes(p["layers"][l]) for p in parts))
    return {"method": parts[0]["method"], "layers": layers}


def quantize_decoder_params(params: Dict, method: str = "q8_0", raw=None) -> Dict:
    """Return a copy of the decoder param tree with the reference's
    quantization-eligible linears replaced by packed quant dicts
    (q8_0 / q4_k / q6_k; k-quant-ineligible in-dims fall back to q8_0).

    `raw` = collect_raw_quant output: matching snapshot payloads are
    packed directly (published-code parity) instead of requantized."""
    if method not in ("q8_0", "q4_k", "q6_k"):
        raise NotImplementedError(
            f"runtime quantization `{method}` not supported"
        )
    raw = raw or {}
    out = dict(params)
    if "lm_head" in out and out["lm_head"] is not None:
        out["lm_head"] = quantize_plain(
            out["lm_head"], method, raw=_raw_for(raw, "", "lm_head")
        )
    for group in ("dense_layers", "moe_layers"):
        if group not in out:
            continue
        layers = dict(out[group])
        for key in PLAIN_KEYS:
            if key in layers:
                layers[key] = quantize_plain(
                    layers[key], method, raw=_raw_for(raw, group, key)
                )
        for key in EXPERT_KEYS:
            if key in layers:
                layers[key] = quantize_expert_stack(
                    layers[key], method, raw=_raw_for(raw, group, key)
                )
        out[group] = layers
    return out
