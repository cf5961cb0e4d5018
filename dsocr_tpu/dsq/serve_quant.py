"""Family-agnostic packed-quantization for serving (Q8_0 / Q4_K / Q6_K).

The reference serves DSQ snapshots by keeping ggml-packed weights
resident and dequantizing inside QMatMul at matmul time (dsq-runtime →
candle QMatMul, dsq-runtime/src/lib.rs:316-369) for every adapter family
(deepseek, paddleocr-vl, dots — dsq-models/src/adapters/). The TPU
equivalent packs weights as int8 codes + f16-derived block scales (or
k-quant planes) in HBM and streams them through the Pallas dequant
kernels (ops/pallas/{dequant,kquant}_matmul.py).

This module holds the machinery shared by every family's
`quantize_*_params`: ggml row quantization from host numpy, published
raw-payload short-circuits (snapshot parity), fused-projection payload
assembly, and the plain/expert-stack packers. Family modules
(models/*/quantize.py) decide WHICH keys quantize — mirroring the
reference's per-family LinearSpec discovery.

All outputs are HOST numpy: engines own the one-shot device upload
(and the mesh placement), which keeps the packed trees disk-cacheable
(utils/init_cache.py) without round-tripping the tunnel.

Layouts:
  plain linears → {codes [.., out, in] int8, scales [.., out, in/32]}
    (ggml row layout; consumed by q8_matmul / q8_matmul_layered)
  expert stacks → {codes [L, E, in, out], scales [L, E, in/32, out]}
    (in-major; consumed by the gather/dense-expert kernels and by the
    prefill dequant-to-bf16 + ragged_dot path without any transpose)

Snapshot parity: re-quantizing a dequantized Q8_0 payload is BIT-EXACT
(the amax element always maps to ±127 so the f16 scale round-trips;
verified in tests/test_dequant_matmul.py); k-quants are NOT round-trip
exact, so their published payloads must pack directly (`raw`).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..ops.pallas.dequant_matmul import pack_q8_0


def q8_rows(rows: np.ndarray):
    """[R, K] f32 → (codes [R, K] int8, scales [R, K/32] f32).

    Same math as quantize_q8_0 → pack_q8_0 (verified byte-identical in
    tests) without materializing the interleaved payload — the bytes
    round trip dominated host quantization time on 3B models. Codes use
    the f32 scale's inverse; the RETURNED scale is the f16-stored value
    (what dequantize reads), exactly like the payload path."""
    import os

    r, k = rows.shape
    if os.environ.get("DSOCR_NO_NATIVE") != "1":
        from ..native import quantize_native

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


def effective_method(method: str, in_dim: int) -> str:
    """k-quants need 256-element super-blocks along the contraction dim;
    ineligible tensors fall back to Q8_0 (the reference's exporter falls
    back to float for them — Q8_0 is the strictly better TPU fallback)."""
    if method in ("q4_k", "q6_k") and in_dim % 256 != 0:
        return "q8_0"
    return method


PAYLOAD_BYTES_PER_ROW = {  # ggml block bytes per weight row of length i
    "q8_0": lambda i: (i // 32) * 34,
    "q4_k": lambda i: (i // 256) * 144,
    "q6_k": lambda i: (i // 256) * 210,
}


def raw_payload_for(raw, method: str, rows: int, i: int):
    """Concatenated raw payload bytes when the snapshot's dtype matches
    the requested effective method and the byte count checks out."""
    if raw is None or raw.get("method") != method:
        return None
    flat = []
    for layer in raw["layers"]:
        flat.extend(layer if isinstance(layer, list) else [layer])
    payload = b"".join(bytes(p) for p in flat)
    if len(payload) != rows * PAYLOAD_BYTES_PER_ROW[method](i):
        return None
    return payload


def quantize_plain(w, method: str = "q8_0", raw=None) -> Dict:
    """[.., in, out] float → packed quant dict in ggml row layout
    (q8_0: {codes [.., out, in]}; q4_k/q6_k: plane dicts, kquant_matmul).

    `raw` (a family loader's collect_raw_quant entry) short-circuits the
    quantizer with the snapshot's published payload — bit-identical to
    the reference's QMatMul input; required for k-quants where
    requantize(dequantize) is not exact. in_dims not divisible by the
    Q8_0 block stay float (the reference exporter's fallback,
    dsq-writer lib.rs)."""
    arr = np.asarray(w, np.float32)
    *lead, i, o = arr.shape
    if i % 32:
        return w  # not block-eligible at all → float serving
    method = effective_method(method, i)
    rows_n = int(np.prod(lead, dtype=np.int64)) * o if lead else o
    payload = raw_payload_for(raw, method, rows_n, i)
    if method == "q8_0":
        if payload is not None:
            codes, scales = pack_q8_0(payload, rows_n, i)
            codes, scales = np.asarray(codes), np.asarray(scales)
        else:
            rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
            codes, scales = q8_rows(rows)
        return {
            "codes": np.ascontiguousarray(codes.reshape(*lead, o, i)),
            "scales": np.ascontiguousarray(scales.reshape(*lead, o, i // 32)),
        }
    from .quant import quantize as ggml_quantize
    from ..ops.pallas.kquant_matmul import pack_q4_k, pack_q6_k

    if payload is None:
        rows = arr.reshape(-1, i, o).transpose(0, 2, 1).reshape(-1, i)
        payload = ggml_quantize(method.upper(), rows, rows_n, i)
    packed = (pack_q4_k if method == "q4_k" else pack_q6_k)(payload, rows_n, i)
    return {
        key: np.ascontiguousarray(np.asarray(v).reshape(*lead, o, *v.shape[1:]))
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
    method = effective_method(method, i)

    def layer_payload(l):
        if raw is None or raw.get("method") != method:
            return None
        payload = b"".join(bytes(p) for p in raw["layers"][l])
        if len(payload) != E * o * PAYLOAD_BYTES_PER_ROW[method](i):
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
                codes, scales = q8_rows(rows)
            codes_out[l] = codes.reshape(E, o, i).transpose(0, 2, 1)
            scales_out[l] = scales.reshape(E, o, i // 32).transpose(0, 2, 1)
        return {"codes": codes_out, "scales": scales_out}
    from .quant import quantize as ggml_quantize
    from ..ops.pallas.kquant_matmul import pack_q4_k_inmajor, pack_q6_k_inmajor

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
        key: np.stack([np.asarray(p[key]) for p in per_layer])
        for key in per_layer[0]
    }


def fused_raw(raw: Dict, group: str, key: str, fused_from: Dict):
    """Raw payloads for an engine-init-FUSED projection: fusion concats
    along the OUT dim, so the fused ggml payload is the parts' payloads
    concatenated in fuse order (per layer; per expert for expert
    stacks). `fused_from` maps fused key → source key tuple."""
    ent = raw.get((group, key))
    if ent is not None:
        return ent
    parts_keys = fused_from.get(key)
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


def collect_raw_plain(reader, raw: Dict, group: str, key: str, names) -> None:
    """Shared loader helper: record the snapshot's raw payloads for a
    stacked plain linear when EVERY layer's record exists with one
    dtype. `names` = per-layer tensor names (without `.weight`)."""
    hits = [reader.raw_quant(f"{name}.weight") for name in names]
    if not hits or any(h is None for h in hits):
        return
    dtypes = {h[1] for h in hits}
    if len(dtypes) != 1:
        return
    raw[(group, key)] = {
        "method": hits[0][1].lower(),
        "layers": [h[0] for h in hits],
    }
