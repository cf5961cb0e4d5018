"""Mixture-of-experts routing and grouped expert execution.

Routing semantics mirror the reference's run_moe
(infer-deepseek/src/transformer/block.rs:1215-1395): f32 gating matmul,
softmax or sigmoid scoring with optional e_score_correction bias, greedy
top-k, optional top-k weight normalization (+1e-20) and routed scaling,
f32 combine, shared experts added by the caller.

Execution is TPU-native instead of the reference's host-side sort loop:
assignments are argsorted by expert on device and the expert MLPs run as
grouped matmuls via ``jax.lax.ragged_dot`` over weight stacks
[E, hidden, inter] — this maps onto the Mosaic grouped-matmul path and
shards over the expert axis for expert parallelism.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .activations import silu


@dataclasses.dataclass
class MoeConfig:
    num_experts: int
    top_k: int
    scoring: str = "softmax"  # "softmax" | "sigmoid"
    norm_topk_prob: bool = False
    routed_scaling_factor: float = 1.0


def moe_router(
    tokens: jnp.ndarray,  # [N, hidden]
    gate_weight: jnp.ndarray,  # [E, hidden]
    cfg: MoeConfig,
    aux_bias: Optional[jnp.ndarray] = None,  # [E]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (topk_weights [N, K] f32, topk_indices [N, K] int32)."""
    # precision=highest: on TPU, f32 matmuls otherwise run as bf16 multiplies;
    # gating determinism gates routing parity (ref block.rs:1264-1270).
    logits = jnp.einsum(
        "nh,eh->ne",
        tokens.astype(jnp.float32),
        gate_weight.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if aux_bias is not None:
        logits = logits + aux_bias.astype(jnp.float32)[None, :]
    if cfg.scoring == "softmax":
        scores = jax.nn.softmax(logits, axis=-1)
    elif cfg.scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        raise ValueError(f"MoE scoring `{cfg.scoring}` not supported")

    topk_weights, topk_indices = jax.lax.top_k(scores, cfg.top_k)
    if cfg.top_k > 1 and cfg.norm_topk_prob:
        denom = jnp.sum(topk_weights, axis=-1, keepdims=True) + 1e-20
        topk_weights = topk_weights / denom
    if cfg.routed_scaling_factor != 1.0:
        topk_weights = topk_weights * jnp.float32(cfg.routed_scaling_factor)
    return topk_weights, topk_indices.astype(jnp.int32)


def moe_apply(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,  # [N, K] f32
    topk_indices: jnp.ndarray,  # [N, K] int32
    gate_proj: jnp.ndarray,  # [E, hidden, inter]
    up_proj: jnp.ndarray,  # [E, hidden, inter]
    down_proj: jnp.ndarray,  # [E, inter, hidden]
) -> jnp.ndarray:
    """Run the routed experts as grouped matmuls; returns [N, hidden] in
    tokens.dtype."""
    n, hidden = tokens.shape
    k = topk_indices.shape[1]
    num_experts = gate_proj.shape[0]
    assignments = n * k

    flat_expert = topk_indices.reshape(assignments)
    # Sort assignment slots by expert id → contiguous per-expert groups.
    order = jnp.argsort(flat_expert)
    token_for_slot = order // k  # original token of each sorted slot
    sorted_tokens = tokens[token_for_slot]  # [A, hidden]
    group_sizes = jnp.bincount(flat_expert, length=num_experts).astype(jnp.int32)

    gates = jax.lax.ragged_dot(sorted_tokens, gate_proj, group_sizes)
    ups = jax.lax.ragged_dot(sorted_tokens, up_proj, group_sizes)
    inter = (silu(gates.astype(jnp.float32)) * ups.astype(jnp.float32)).astype(
        tokens.dtype
    )
    outs = jax.lax.ragged_dot(inter, down_proj, group_sizes)  # [A, hidden]

    # Unsort back to (token, k) slot order, combine with routing weights in f32.
    unsorted = jnp.zeros_like(outs).at[order].set(outs)
    per_slot = unsorted.reshape(n, k, hidden).astype(jnp.float32)
    combined = jnp.sum(per_slot * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def swiglu_mlp(
    x: jnp.ndarray,  # [..., hidden]
    gate_proj: jnp.ndarray,  # [hidden, inter]
    up_proj: jnp.ndarray,  # [hidden, inter]
    down_proj: jnp.ndarray,  # [inter, hidden]
) -> jnp.ndarray:
    """Dense SwiGLU MLP (the reference's run_dense_mlp)."""
    gates = jnp.einsum("...h,hi->...i", x, gate_proj, preferred_element_type=jnp.float32)
    ups = jnp.einsum("...h,hi->...i", x, up_proj, preferred_element_type=jnp.float32)
    inter = (silu(gates) * ups).astype(x.dtype)
    out = jnp.einsum(
        "...i,ih->...h", inter, down_proj, preferred_element_type=jnp.float32
    )
    return out.astype(x.dtype)
