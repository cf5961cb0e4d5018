"""Shared TPU compute ops: stability-critical norms, RoPE, attention,
MoE routing, activations.

Design rules (SURVEY.md §7.3 item 1 + TPU practice):
- matmuls run in the working dtype (bf16) with f32 accumulation
  (``preferred_element_type``);
- softmax, RMSNorm, gating, and logits are computed in f32 — the same
  reductions the reference hardened after its f16/f32 divergence hunt
  (infer-deepseek/src/transformer/block.rs:18-42);
- shapes are static; variable lengths are handled by masking.
"""

from .norms import rms_norm, layer_norm
from .rope import build_rope_tables, apply_rope, rotate_half, mla_interleave_regroup
from .activations import silu, gelu, gelu_tanh, quick_gelu, ACT2FN
from .attention import (
    repeat_kv,
    causal_mask,
    attention,
    attention_kv_int8,
    quantize_kv_int8,
)
from .moe import MoeConfig, moe_router, moe_apply, moe_apply_gather, swiglu_mlp

__all__ = [
    "rms_norm",
    "layer_norm",
    "build_rope_tables",
    "apply_rope",
    "rotate_half",
    "mla_interleave_regroup",
    "silu",
    "gelu",
    "gelu_tanh",
    "quick_gelu",
    "ACT2FN",
    "repeat_kv",
    "causal_mask",
    "attention",
    "attention_kv_int8",
    "quantize_kv_int8",
    "MoeConfig",
    "moe_router",
    "moe_apply",
    "moe_apply_gather",
    "swiglu_mlp",
]
