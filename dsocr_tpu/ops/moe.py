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


def moe_apply_single(
    tokens: jnp.ndarray,  # [1, hidden]
    topk_weights: jnp.ndarray,  # [1, K]
    topk_indices: jnp.ndarray,  # [1, K]
    gate_proj: jnp.ndarray,
    up_proj: jnp.ndarray,
    down_proj: jnp.ndarray,
) -> jnp.ndarray:
    """Batch-1 decode MoE: unrolled K-loop of dynamic expert slices.

    Measured 10x faster than both the XLA fancy-index gather and the
    Pallas gather kernel for a single token (XLA fuses each
    dynamic_index slice into its matmul with no materialized copy)."""
    k = topk_indices.shape[1]
    out = jnp.zeros((1, down_proj.shape[-1]), jnp.float32)
    for slot in range(k):
        e = topk_indices[0, slot]
        wg = jax.lax.dynamic_index_in_dim(gate_proj, e, 0, keepdims=False)
        wu = jax.lax.dynamic_index_in_dim(up_proj, e, 0, keepdims=False)
        wd = jax.lax.dynamic_index_in_dim(down_proj, e, 0, keepdims=False)
        gate = jnp.einsum("nh,hi->ni", tokens, wg, preferred_element_type=jnp.float32)
        up = jnp.einsum("nh,hi->ni", tokens, wu, preferred_element_type=jnp.float32)
        inter = (silu(gate) * up).astype(tokens.dtype)
        out = out + topk_weights[:, slot : slot + 1] * jnp.einsum(
            "ni,ih->nh", inter, wd, preferred_element_type=jnp.float32
        )
    return out.astype(tokens.dtype)


def moe_apply_gather(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,  # [N, K] f32
    topk_indices: jnp.ndarray,  # [N, K] int32
    gate_proj: jnp.ndarray,  # [E, hidden, inter]
    up_proj: jnp.ndarray,  # [E, hidden, inter]
    down_proj: jnp.ndarray,  # [E, inter, hidden]
) -> jnp.ndarray:
    """Decode-path MoE: gather only the selected experts' weights.

    For tiny token counts (autoregressive decode) the grouped-matmul path
    streams the ENTIRE expert stack from HBM every step; gathering the
    K selected experts reads K/E of the bytes. The gather itself is a
    Pallas scalar-prefetch kernel (ops.pallas.gather_matmul) because XLA
    materializes `w[idx]` as full HBM copies before the matmul.
    """
    from .pallas.gather_matmul import gather_matmul_auto

    n, k = topk_indices.shape
    hidden = tokens.shape[1]
    flat_idx = topk_indices.reshape(n * k)
    flat_x = jnp.repeat(tokens, k, axis=0)  # [N*K, H] — slot s uses token s//K
    gates = gather_matmul_auto(flat_x, gate_proj, flat_idx)  # [N*K, I] f32
    ups = gather_matmul_auto(flat_x, up_proj, flat_idx)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = gather_matmul_auto(inter, down_proj, flat_idx)  # [N*K, H] f32
    combined = jnp.sum(
        outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
    )
    return combined.astype(tokens.dtype)


def moe_apply_dense(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,  # [N, K]
    topk_indices: jnp.ndarray,  # [N, K]
    gate_proj: jnp.ndarray,
    up_proj: jnp.ndarray,
    down_proj: jnp.ndarray,
) -> jnp.ndarray:
    """Small-batch decode MoE: run EVERY expert on every token and select
    afterwards. At N ≤ ~32 the step is bound by streaming the expert
    weights once (which ragged_dot also pays), and the dense einsum
    avoids ragged_dot's per-group overhead at tiny group sizes."""
    gates = jnp.einsum(
        "nh,ehi->nei", tokens, gate_proj, preferred_element_type=jnp.float32
    )
    ups = jnp.einsum(
        "nh,ehi->nei", tokens, up_proj, preferred_element_type=jnp.float32
    )
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = jnp.einsum(
        "nei,eih->neh", inter, down_proj, preferred_element_type=jnp.float32
    )  # [N, E, H]
    sel = jnp.take_along_axis(outs, topk_indices[..., None], axis=1)  # [N, K, H]
    combined = jnp.sum(sel * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


class LayeredQ8:
    """View of one layer's slice of a stacked packed-Q8 linear.

    Scan bodies must NOT slice quantized stacks with lax ops — an XLA
    dynamic-slice feeding a Pallas custom call materializes a full copy
    of the layer (150 MB per expert stack per decode step, measured).
    Instead the whole [L, ...] stack is closure-captured and the traced
    layer index rides scalar prefetch into the kernels."""

    __slots__ = ("codes", "scales", "layer")

    def __init__(self, codes, scales, layer):
        self.codes = codes
        self.scales = scales
        self.layer = layer


class LayeredKQuant:
    """LayeredQ8 counterpart for plane-packed Q4_K/Q6_K stacks: holds the
    whole stacked array dict plus the traced layer index; the layer rides
    scalar prefetch into the k-quant kernels."""

    __slots__ = ("arrays", "layer", "method")

    def __init__(self, arrays, layer, method):
        self.arrays = arrays
        self.layer = layer
        self.method = method


def quant_method(q) -> str:
    """Identify a packed-quant dict/view by its array keys."""
    if isinstance(q, LayeredQ8):
        return "q8_0"
    if isinstance(q, LayeredKQuant):
        return q.method
    if "packed" in q:
        return "q4_k"
    if "ql_a" in q:
        return "q6_k"
    return "q8_0"


def is_quantized(q) -> bool:
    return isinstance(q, (dict, LayeredQ8, LayeredKQuant))


def dequant_stack(q) -> jnp.ndarray:
    """Any packed-quant dict or Layered view of an in-major expert stack →
    bf16 [E, in, out] for the prefill grouped-matmul path (one dequant
    write per layer is cheap next to the prefill matmuls). Float stacks
    pass through unchanged — a group may be MIXED quant/float when one
    projection's in_dim misses the block size (e.g. down_proj with
    moe_intermediate_size % 32 != 0 stays float while gate/up quantize)."""
    if not is_quantized(q):
        return q
    method = quant_method(q)
    if method == "q8_0":
        return dequant_q8_stack(q)
    from .pallas.kquant_matmul import dequant_q4k_planes, dequant_q6k_planes

    if isinstance(q, LayeredKQuant):
        arrays = {
            k: jax.lax.dynamic_index_in_dim(v, q.layer, 0, keepdims=False)
            for k, v in q.arrays.items()
        }
    else:
        arrays = q
    fn = dequant_q4k_planes if method == "q4_k" else dequant_q6k_planes
    return fn(arrays, axis=-2)


def dequant_q8_stack(q) -> jnp.ndarray:
    """{codes [E, in, out] int8, scales [E, in/32, out] f32} → bf16
    [E, in, out]. Used by the prefill path: grouped matmuls want bf16
    stacks, and a once-per-layer dequant write is cheap relative to the
    prefill matmuls (decode uses the fused q8 gather kernel instead).
    Also accepts a LayeredQ8 view (stacked [L, E, in, out] + traced
    layer index) — the dynamic-slice fuses into the dequant write."""
    if isinstance(q, LayeredQ8):
        codes = jax.lax.dynamic_index_in_dim(q.codes, q.layer, 0, keepdims=False)
        scales = jax.lax.dynamic_index_in_dim(q.scales, q.layer, 0, keepdims=False)
    else:
        codes = q["codes"]
        scales = q["scales"]
    full = jnp.repeat(scales, codes.shape[1] // scales.shape[1], axis=1)
    return (codes.astype(jnp.float32) * full).astype(jnp.bfloat16)


def moe_apply_q8(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,  # [N, K]
    topk_indices: jnp.ndarray,  # [N, K]
    gate_q,  # {codes [E, H, I] int8, scales [E, H/32, I] f32}
    up_q,
    down_q,  # {codes [E, I, H], scales [E, I/32, H]}
) -> jnp.ndarray:
    """Decode MoE straight from Q8_0 weights: the scalar-prefetch gather
    kernel DMAs only the K selected experts' quantized tiles (~0.53
    B/weight — a quarter of the bf16 decode traffic)."""
    from .pallas.dequant_matmul import (
        q8_gather_matmul_auto,
        q8_gather_matmul_layered_auto,
    )

    n, k = topk_indices.shape
    hidden = tokens.shape[1]
    flat_idx = topk_indices.reshape(n * k)
    flat_x = jnp.repeat(tokens, k, axis=0)
    if isinstance(gate_q, LayeredQ8):
        li = gate_q.layer
        gates = q8_gather_matmul_layered_auto(
            flat_x, gate_q.codes, gate_q.scales, flat_idx, li
        )
        ups = q8_gather_matmul_layered_auto(
            flat_x, up_q.codes, up_q.scales, flat_idx, li
        )
        inter = (silu(gates) * ups).astype(tokens.dtype)
        outs = q8_gather_matmul_layered_auto(
            inter, down_q.codes, down_q.scales, flat_idx, li
        )
        combined = jnp.sum(
            outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
        )
        return combined.astype(tokens.dtype)
    gates = q8_gather_matmul_auto(flat_x, gate_q["codes"], gate_q["scales"], flat_idx)
    ups = q8_gather_matmul_auto(flat_x, up_q["codes"], up_q["scales"], flat_idx)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = q8_gather_matmul_auto(inter, down_q["codes"], down_q["scales"], flat_idx)
    combined = jnp.sum(
        outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
    )
    return combined.astype(tokens.dtype)


def _kq_gather(x, q, idx):
    """Dispatch a gather matmul against a packed k-quant stack or view."""
    from .pallas.kquant_matmul import (
        q4k_gather_matmul_auto,
        q4k_gather_matmul_layered_auto,
        q6k_gather_matmul_auto,
        q6k_gather_matmul_layered_auto,
    )

    method = quant_method(q)
    if isinstance(q, LayeredKQuant):
        fn = (
            q4k_gather_matmul_layered_auto
            if method == "q4_k"
            else q6k_gather_matmul_layered_auto
        )
        return fn(x, q.arrays, idx, q.layer)
    fn = q4k_gather_matmul_auto if method == "q4_k" else q6k_gather_matmul_auto
    return fn(x, q, idx)


def _kq_n_experts(q) -> int:
    arrays = q.arrays if isinstance(q, LayeredKQuant) else q
    key = "packed" if "packed" in arrays else "ql_a"
    return arrays[key].shape[1 if isinstance(q, LayeredKQuant) else 0]


def _n_experts_any(q) -> int:
    """Expert count of any stack kind (Layered* view, packed dict, float)."""
    if isinstance(q, LayeredQ8):
        return q.codes.shape[1]
    if isinstance(q, LayeredKQuant):
        return _kq_n_experts(q)
    if isinstance(q, dict):
        return q["codes"].shape[0] if "codes" in q else _kq_n_experts(q)
    return q.shape[0]


def _gather_any(x, q, idx):
    """Gather-matmul rows of x against idx-selected experts of ANY stack
    kind. Mixed-method groups are real: the quantizer falls back
    per-tensor when a projection's in_dim misses the block size, e.g.
    q4_k gate+up (block 256) with a q8_0 down at moe_inter % 256 != 0."""
    if not is_quantized(q):
        # Float fallback (rare: only when a projection could not quantize
        # at all). Correctness over speed — the gather materializes.
        return jnp.einsum(
            "ai,aio->ao", x, q[idx], preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if quant_method(q) == "q8_0":
        from .pallas.dequant_matmul import (
            q8_gather_matmul_auto,
            q8_gather_matmul_layered_auto,
        )

        if isinstance(q, LayeredQ8):
            return q8_gather_matmul_layered_auto(x, q.codes, q.scales, idx, q.layer)
        return q8_gather_matmul_auto(x, q["codes"], q["scales"], idx)
    return _kq_gather(x, q, idx)


def _dense_ok(q) -> bool:
    """Dense all-expert kernels exist only for Layered* stacks (and float
    arrays, which use a plain einsum)."""
    return isinstance(q, (LayeredQ8, LayeredKQuant)) or not is_quantized(q)


def _dense_any(x, q):
    """Dense all-expert sweep with shared x [N, H] → [E, N, M], any kind."""
    if not is_quantized(q):
        return jnp.einsum(
            "nh,ehm->enm", x, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if quant_method(q) == "q8_0":
        from .pallas.dequant_matmul import q8_dense_experts_layered_auto

        return q8_dense_experts_layered_auto(x, q.codes, q.scales, q.layer)
    return _kq_dense(x, q)


def _dense_perx_any(x, q):
    """Dense all-expert sweep with per-expert x [E, N, K] → [E, N, M]."""
    if not is_quantized(q):
        return jnp.einsum(
            "enk,ekm->enm", x, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if quant_method(q) == "q8_0":
        from .pallas.dequant_matmul import q8_dense_experts_perx_layered_auto

        return q8_dense_experts_perx_layered_auto(x, q.codes, q.scales, q.layer)
    return _kq_dense_perx(x, q)


def _kq_dense(x, q):
    """Dense all-expert sweep with shared x [N, H] → [E, N, M]."""
    from .pallas.kquant_matmul import (
        q4k_dense_experts_layered_auto,
        q6k_dense_experts_layered_auto,
    )

    fn = (
        q4k_dense_experts_layered_auto
        if quant_method(q) == "q4_k"
        else q6k_dense_experts_layered_auto
    )
    return fn(x, q.arrays, q.layer)


def _kq_dense_perx(x, q):
    """Dense all-expert sweep with per-expert x [E, N, K] → [E, N, M]."""
    from .pallas.kquant_matmul import (
        q4k_dense_experts_perx_layered_auto,
        q6k_dense_experts_perx_layered_auto,
    )

    fn = (
        q4k_dense_experts_perx_layered_auto
        if quant_method(q) == "q4_k"
        else q6k_dense_experts_perx_layered_auto
    )
    return fn(x, q.arrays, q.layer)


def moe_apply_kq_dense(tokens, topk_weights, topk_indices, gate_q, up_q, down_q):
    """Dense ALL-expert k-quant decode (the q8 dense tier at Q4_K's 0.75 /
    Q6_K's ~1.06 bytes-per-weight): stream every expert once instead of
    re-gathering shared experts when N*top_k > n_experts. Each projection
    dispatches on its OWN method (mixed q4_k/q6_k + q8_0 groups occur)."""
    gates = _dense_any(tokens, gate_q)  # [E, N, I]
    ups = _dense_any(tokens, up_q)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = _dense_perx_any(inter, down_q)  # [E, N, hidden]
    sel = jnp.take_along_axis(
        outs.transpose(1, 0, 2), topk_indices[..., None], axis=1
    )  # [N, K, hidden]
    combined = jnp.sum(sel * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def moe_apply_kq_dense_fused(tokens, topk_weights, topk_indices, gateup_q, down_q):
    """Fused gate+up counterpart of moe_apply_kq_dense."""
    gus = _dense_any(tokens, gateup_q)  # [E, N, 2I]
    gates, ups = _split_gateup(gus)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = _dense_perx_any(inter, down_q)
    sel = jnp.take_along_axis(
        outs.transpose(1, 0, 2), topk_indices[..., None], axis=1
    )
    combined = jnp.sum(sel * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def moe_apply_quant(tokens, topk_weights, topk_indices, gate_q, up_q, down_q):
    """Decode MoE straight from packed weights, any method: q8_0 uses the
    int8 gather kernels, q4_k/q6_k the plane-decoded ones (~0.56/0.81
    B/weight of HBM traffic for the selected experts). Above N*top_k >
    n_experts every variant switches to a dense all-expert sweep."""
    if all(
        is_quantized(q) and quant_method(q) == "q8_0"
        for q in (gate_q, up_q, down_q)
    ):
        return moe_apply_q8(
            tokens, topk_weights, topk_indices, gate_q, up_q, down_q
        )
    n, k = topk_indices.shape
    if n * k > _n_experts_any(gate_q) and all(
        _dense_ok(q) for q in (gate_q, up_q, down_q)
    ):
        return moe_apply_kq_dense(
            tokens, topk_weights, topk_indices, gate_q, up_q, down_q
        )
    hidden = tokens.shape[1]
    flat_idx = topk_indices.reshape(n * k)
    flat_x = jnp.repeat(tokens, k, axis=0)
    gates = _gather_any(flat_x, gate_q, flat_idx)
    ups = _gather_any(flat_x, up_q, flat_idx)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = _gather_any(inter, down_q, flat_idx)
    combined = jnp.sum(
        outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
    )
    return combined.astype(tokens.dtype)


def moe_apply_quant_fused(tokens, topk_weights, topk_indices, gateup_q, down_q):
    """Fused gate+up counterpart of moe_apply_quant."""
    if all(
        is_quantized(q) and quant_method(q) == "q8_0"
        for q in (gateup_q, down_q)
    ):
        return moe_apply_q8_fused(
            tokens, topk_weights, topk_indices, gateup_q, down_q
        )
    n, k = topk_indices.shape
    if n * k > _n_experts_any(gateup_q) and all(
        _dense_ok(q) for q in (gateup_q, down_q)
    ):
        return moe_apply_kq_dense_fused(
            tokens, topk_weights, topk_indices, gateup_q, down_q
        )
    hidden = tokens.shape[1]
    flat_idx = topk_indices.reshape(n * k)
    flat_x = jnp.repeat(tokens, k, axis=0)
    gus = _gather_any(flat_x, gateup_q, flat_idx)
    gates, ups = _split_gateup(gus)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = _gather_any(inter, down_q, flat_idx)
    combined = jnp.sum(
        outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
    )
    return combined.astype(tokens.dtype)


def moe_apply(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,  # [N, K] f32
    topk_indices: jnp.ndarray,  # [N, K] int32
    gate_proj: jnp.ndarray,  # [E, hidden, inter]
    up_proj: jnp.ndarray,  # [E, hidden, inter]
    down_proj: jnp.ndarray,  # [E, inter, hidden]
    *,
    gather_threshold: int = 1,
    dense_threshold: int = 32,
) -> jnp.ndarray:
    """Run the routed experts; returns [N, hidden] in tokens.dtype.

    Dispatches on the static token count: batch-1 decode uses unrolled
    dynamic expert slices (reads only the K selected experts); everything
    else uses sorted grouped matmuls via ragged_dot (streams the full
    expert stack once — already cheaper than per-row gathers at N≥2).
    The Pallas gather path (moe_apply_gather) measured slower than both
    and is kept for experimentation via gather_threshold."""
    if tokens.shape[0] == 1:
        return moe_apply_single(
            tokens, topk_weights, topk_indices, gate_proj, up_proj, down_proj
        )
    if tokens.shape[0] <= gather_threshold:
        return moe_apply_gather(
            tokens, topk_weights, topk_indices, gate_proj, up_proj, down_proj
        )
    if tokens.shape[0] <= dense_threshold:
        return moe_apply_dense(
            tokens, topk_weights, topk_indices, gate_proj, up_proj, down_proj
        )
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


# -- fused gate+up variants ---------------------------------------------------------
#
# Decode on TPU is latency-bound on op/kernel count (dozens of tiny
# matmuls per step), so gate_proj and up_proj are concatenated along the
# output dim at engine init (decoder.fuse_decoder_params) and split
# after the single matmul — column-independent math, bit-identical.


def _split_gateup(x: jnp.ndarray):
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


def moe_apply_single_fused(tokens, topk_weights, topk_indices, gateup, down):
    k = topk_indices.shape[1]
    out = jnp.zeros((1, down.shape[-1]), jnp.float32)
    for slot in range(k):
        e = topk_indices[0, slot]
        wg = jax.lax.dynamic_index_in_dim(gateup, e, 0, keepdims=False)
        wd = jax.lax.dynamic_index_in_dim(down, e, 0, keepdims=False)
        gu = jnp.einsum("nh,hi->ni", tokens, wg, preferred_element_type=jnp.float32)
        gate, up = _split_gateup(gu)
        inter = (silu(gate) * up).astype(tokens.dtype)
        out = out + topk_weights[:, slot : slot + 1] * jnp.einsum(
            "ni,ih->nh", inter, wd, preferred_element_type=jnp.float32
        )
    return out.astype(tokens.dtype)


def moe_apply_dense_fused(tokens, topk_weights, topk_indices, gateup, down):
    gus = jnp.einsum(
        "nh,ehi->nei", tokens, gateup, preferred_element_type=jnp.float32
    )
    gates, ups = _split_gateup(gus)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = jnp.einsum(
        "nei,eih->neh", inter, down, preferred_element_type=jnp.float32
    )
    sel = jnp.take_along_axis(outs, topk_indices[..., None], axis=1)
    combined = jnp.sum(sel * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def moe_apply_fused(
    tokens: jnp.ndarray,  # [N, hidden]
    topk_weights: jnp.ndarray,
    topk_indices: jnp.ndarray,
    gateup: jnp.ndarray,  # [E, hidden, 2*inter]
    down: jnp.ndarray,  # [E, inter, hidden]
    *,
    dense_threshold: int = 32,
) -> jnp.ndarray:
    """Fused-gate_up counterpart of moe_apply (same dispatch tiers)."""
    if tokens.shape[0] == 1:
        return moe_apply_single_fused(tokens, topk_weights, topk_indices, gateup, down)
    if tokens.shape[0] <= dense_threshold:
        return moe_apply_dense_fused(tokens, topk_weights, topk_indices, gateup, down)
    n, hidden = tokens.shape
    k = topk_indices.shape[1]
    num_experts = gateup.shape[0]
    flat_expert = topk_indices.reshape(n * k)
    order = jnp.argsort(flat_expert)
    token_for_slot = order // k
    sorted_tokens = tokens[token_for_slot]
    group_sizes = jnp.bincount(flat_expert, length=num_experts).astype(jnp.int32)

    gus = jax.lax.ragged_dot(sorted_tokens, gateup, group_sizes)
    gates, ups = _split_gateup(gus.astype(jnp.float32))
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = jax.lax.ragged_dot(inter, down, group_sizes)

    unsorted = jnp.zeros_like(outs).at[order].set(outs)
    per_slot = unsorted.reshape(n, k, hidden).astype(jnp.float32)
    combined = jnp.sum(per_slot * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def moe_apply_q8_dense_fused(tokens, topk_weights, topk_indices, gateup_q, down_q):
    """Dense ALL-expert q8 decode: read every expert's packed weights
    ONCE (the bf16 tier's moe_apply_dense strategy at ~half the bytes).
    Cheaper than the per-selection gather once N*top_k > n_experts —
    gathers re-stream shared experts at high slot occupancy."""
    import os

    from .pallas.dequant_matmul import (
        q8_dense_experts_layered_auto,
        q8_dense_experts_perx_layered_auto,
    )

    if os.environ.get("DSOCR_Q8_MEGAFUSED", "0") == "1":
        # one kernel for the whole expert chain: gate+up → silu·up →
        # down → weighted accumulate, no [E, N, *] HBM intermediates
        # (the two-kernel path round-trips ~44 MB/layer at serving
        # geometry). DSOCR_Q8_MEGAFUSED=0 reverts to the two-kernel
        # sweep below.
        from .pallas.dequant_matmul import q8_moe_megafused_layered_auto

        n = tokens.shape[0]
        e = gateup_q.codes.shape[1]
        flat_e = topk_indices.reshape(-1)
        flat_n = (
            jnp.broadcast_to(
                jnp.arange(n, dtype=topk_indices.dtype)[:, None],
                topk_indices.shape,
            ).reshape(-1)
        )
        w_dense = (
            jnp.zeros((e, n), jnp.float32)
            .at[flat_e, flat_n]
            .add(topk_weights.reshape(-1).astype(jnp.float32))
        )
        combined = q8_moe_megafused_layered_auto(
            tokens, w_dense, gateup_q.codes, gateup_q.scales,
            down_q.codes, down_q.scales, gateup_q.layer,
        )
        return combined.astype(tokens.dtype)

    li = gateup_q.layer
    gus = q8_dense_experts_layered_auto(
        tokens, gateup_q.codes, gateup_q.scales, li
    )  # [E, N, 2*inter]
    gates, ups = _split_gateup(gus)
    inter = (silu(gates) * ups).astype(tokens.dtype)
    outs = q8_dense_experts_perx_layered_auto(
        inter, down_q.codes, down_q.scales, li
    )  # [E, N, hidden]
    sel = jnp.take_along_axis(
        outs.transpose(1, 0, 2), topk_indices[..., None], axis=1
    )  # [N, K, hidden]
    combined = jnp.sum(sel * topk_weights[..., None], axis=1)
    return combined.astype(tokens.dtype)


def moe_apply_q8_fused(tokens, topk_weights, topk_indices, gateup_q, down_q):
    """Fused-gate_up q8 decode path (one gather kernel for gate+up)."""
    from .pallas.dequant_matmul import (
        q8_gather_matmul_auto,
        q8_gather_matmul_layered_auto,
    )

    n, k = topk_indices.shape
    hidden = tokens.shape[1]
    if (
        isinstance(gateup_q, LayeredQ8)
        and n * k > gateup_q.codes.shape[1]  # selections exceed n_experts
    ):
        return moe_apply_q8_dense_fused(
            tokens, topk_weights, topk_indices, gateup_q, down_q
        )
    flat_idx = topk_indices.reshape(n * k)
    flat_x = jnp.repeat(tokens, k, axis=0)
    if isinstance(gateup_q, LayeredQ8):
        gus = q8_gather_matmul_layered_auto(
            flat_x, gateup_q.codes, gateup_q.scales, flat_idx, gateup_q.layer
        )
        gates, ups = _split_gateup(gus)
        inter = (silu(gates) * ups).astype(tokens.dtype)
        outs = q8_gather_matmul_layered_auto(
            inter, down_q.codes, down_q.scales, flat_idx, down_q.layer
        )
    else:
        gus = q8_gather_matmul_auto(
            flat_x, gateup_q["codes"], gateup_q["scales"], flat_idx
        )
        gates, ups = _split_gateup(gus)
        inter = (silu(gates) * ups).astype(tokens.dtype)
        outs = q8_gather_matmul_auto(
            inter, down_q["codes"], down_q["scales"], flat_idx
        )
    combined = jnp.sum(
        outs.reshape(n, k, hidden) * topk_weights[..., None], axis=1
    )
    return combined.astype(tokens.dtype)


# -- expert-parallel (EP) quantized dispatch -----------------------------------
#
# Packed-quant expert stacks shard over the E axis of the mesh's mp
# dimension (the reference explicitly bails on ep_size > 1,
# block.rs:1248-1252). Pallas calls have no GSPMD partitioning rule, so
# the decode gather/dense kernels run per-shard via shard_map: each
# device gathers only ITS experts (global top-k ids remapped to local,
# off-shard selections weight-masked to zero) and one psum combines the
# routed outputs. Prefill needs no shard_map — its dequant+ragged_dot
# path is pure XLA and GSPMD partitions it like the float EP path.


def _ep_spec():
    from jax.sharding import PartitionSpec as P

    # [L, E, ...] stacks: E over mp. A rank-2 PREFIX spec (trailing dims
    # replicated) so the same spec covers q8 codes/scales (rank 4) AND
    # every k-quant plane rank (pack_q4_k/q6_k_inmajor dicts).
    return P(None, "mp")


def expert_stack_sharding(mesh):
    """NamedSharding for a packed [L, E, ...] expert stack under EP (a
    rank-2 prefix spec — trailing dims replicate, so one spec covers
    every plane rank)."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, _ep_spec())


def _ep_localize(topk_weights, topk_indices, e_local):
    rank = jax.lax.axis_index("mp")
    local_idx = topk_indices - rank * e_local
    valid = (local_idx >= 0) & (local_idx < e_local)
    safe = jnp.clip(local_idx, 0, e_local - 1)
    w = jnp.where(valid, topk_weights, 0.0)
    return w, safe


def _ep_view_parts(q):
    """Split a Layered* view into (pytree-of-arrays, rebuild) where the
    arrays are the E-shardable [L, E, ...] stacks and rebuild(arrays,
    layer) reconstructs the per-shard view inside shard_map."""
    if isinstance(q, LayeredQ8):
        return (
            {"codes": q.codes, "scales": q.scales},
            lambda a, layer: LayeredQ8(a["codes"], a["scales"], layer),
        )
    method = q.method
    return (
        dict(q.arrays),
        lambda a, layer: LayeredKQuant(a, layer, method),
    )


def _ep_local_experts(arrays) -> int:
    """Local (per-shard) expert count of a stack-arrays dict: every plane
    is [L, E_local, ...] inside shard_map."""
    if "codes" in arrays:
        return arrays["codes"].shape[1]
    key = "packed" if "packed" in arrays else "ql_a"
    return arrays[key].shape[1]


def moe_apply_quant_ep_fused(tokens, topk_weights, topk_indices, gateup, down, mesh):
    """EP decode dispatch for fused gate+up packed stacks — LayeredQ8
    (q8_0) or LayeredKQuant (q4_k/q6_k) views over [L, E, ...]."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    gu_arrays, gu_build = _ep_view_parts(gateup)
    d_arrays, d_build = _ep_view_parts(down)

    def local(tokens, w, idx, layer, gu_a, d_a):
        w, safe = _ep_localize(w, idx, _ep_local_experts(gu_a))
        out = moe_apply_quant_fused(
            tokens, w, safe, gu_build(gu_a, layer), d_build(d_a, layer)
        )
        return jax.lax.psum(out.astype(jnp.float32), "mp")

    es = _ep_spec()
    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), es, es),  # es is a pytree-prefix spec
        out_specs=P(),
        check_vma=False,  # pallas out_shape carries no vma
    )(tokens, topk_weights, topk_indices, gateup.layer, gu_arrays, d_arrays)
    return out.astype(tokens.dtype)


def moe_apply_quant_ep(tokens, topk_weights, topk_indices, gate, up, down, mesh):
    """EP decode dispatch for split gate/up/down packed stacks (q8_0 or
    k-quant Layered views)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    g_arrays, g_build = _ep_view_parts(gate)
    u_arrays, u_build = _ep_view_parts(up)
    d_arrays, d_build = _ep_view_parts(down)

    def local(tokens, w, idx, layer, g_a, u_a, d_a):
        w, safe = _ep_localize(w, idx, _ep_local_experts(g_a))
        out = moe_apply_quant(
            tokens, w, safe,
            g_build(g_a, layer), u_build(u_a, layer), d_build(d_a, layer),
        )
        return jax.lax.psum(out.astype(jnp.float32), "mp")

    es = _ep_spec()
    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), es, es, es),
        out_specs=P(),
        check_vma=False,  # pallas out_shape carries no vma
    )(tokens, topk_weights, topk_indices, gate.layer, g_arrays, u_arrays, d_arrays)
    return out.astype(tokens.dtype)
