"""Runtime quantization of the DeepSeek decoder for packed serving.

Key selection mirrors the reference's deepseek adapter
(dsq-models/src/adapters/deepseek_ocr.rs:66-121: attention q/k/v/o, MLP
gate/up/down, routed + shared experts, lm_head); the packing/parity
machinery is shared across families in dsq/serve_quant.py. Router gate
weights, norms, and embed_tokens stay float (the reference keeps the
router f32 too — gating parity gates routing).

The dense-prefix MLP (gate/up/down_proj, intermediate 6848) is left
float: 6848 is not lane-aligned and its VMEM working set does not fit
the dequant kernel; it is one layer (~5% of per-step weight bytes).
"""

from __future__ import annotations

from typing import Dict

from ...dsq.serve_quant import (  # noqa: F401  (re-exported for tests)
    effective_method as _effective_method,
    fused_raw,
    q8_rows as _q8_rows,
    quantize_expert_stack,
    quantize_plain,
)

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

# engine-init fusion concatenates along the OUT dim, so the fused ggml
# payload is the parts' payloads concatenated in fuse order
_FUSED_FROM = {
    "qkv_proj": ("q_proj", "k_proj", "v_proj"),
    "shared_gateup": ("shared_gate", "shared_up"),
    "experts_gateup": ("experts_gate", "experts_up"),
}


def _raw_for(raw: Dict, group: str, key: str):
    return fused_raw(raw, group, key, _FUSED_FROM)


def quantize_decoder_params(params: Dict, method: str = "q8_0", raw=None) -> Dict:
    """Return a copy of the decoder param tree with the reference's
    quantization-eligible linears replaced by packed quant dicts
    (q8_0 / q4_k / q6_k; k-quant-ineligible in-dims fall back to q8_0).

    `raw` = loader.collect_raw_quant output: matching snapshot payloads
    are packed directly (published-code parity) instead of requantized."""
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
