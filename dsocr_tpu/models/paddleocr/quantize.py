"""Runtime quantization of the Ernie decoder for packed serving.

Key selection mirrors the reference's paddleocr-vl adapter
(dsq-models/src/adapters/paddleocr_vl.rs: attention q/k/v/o, MLP
gate/up/down per layer, lm_head; the SigLIP tower and projector stay
float). Packing/parity machinery is shared in dsq/serve_quant.py.
"""

from __future__ import annotations

from typing import Dict

from ...dsq.serve_quant import fused_raw, quantize_plain

PLAIN_KEYS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "qkv_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "gateup_proj",
    "down_proj",
)

_FUSED_FROM = {
    "qkv_proj": ("q_proj", "k_proj", "v_proj"),
    "gateup_proj": ("gate_proj", "up_proj"),
}


def quantize_ernie_params(params: Dict, method: str = "q8_0", raw=None) -> Dict:
    """Copy of the Ernie decoder tree with quantization-eligible linears
    replaced by packed quant dicts (see deepseek counterpart for the
    method/raw semantics)."""
    if method not in ("q8_0", "q4_k", "q6_k"):
        raise NotImplementedError(
            f"runtime quantization `{method}` not supported"
        )
    raw = raw or {}
    out = dict(params)
    if "lm_head" in out and out["lm_head"] is not None:
        out["lm_head"] = quantize_plain(
            out["lm_head"], method, raw=fused_raw(raw, "", "lm_head", {})
        )
    layers = dict(out["layers"])
    for key in PLAIN_KEYS:
        if key in layers:
            layers[key] = quantize_plain(
                layers[key], method,
                raw=fused_raw(raw, "layers", key, _FUSED_FROM),
            )
    out["layers"] = layers
    return out
