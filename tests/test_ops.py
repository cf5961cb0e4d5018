"""Shared op correctness: norms, rope, attention, MoE vs naive references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsocr_tpu.ops import (
    MoeConfig,
    apply_rope,
    attention,
    build_rope_tables,
    causal_mask,
    layer_norm,
    mla_interleave_regroup,
    moe_apply,
    moe_router,
    quick_gelu,
    repeat_kv,
    rms_norm,
    rotate_half,
    swiglu_mlp,
)


def test_rms_norm_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=16).astype(np.float32)
    out = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_rms_norm_bf16_returns_bf16():
    x = jnp.ones((1, 4, 8), dtype=jnp.bfloat16)
    out = rms_norm(x, jnp.ones(8))
    assert out.dtype == jnp.bfloat16


def test_layer_norm_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, 12)).astype(np.float32)
    w = rng.normal(size=12).astype(np.float32)
    b = rng.normal(size=12).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    expected = (x - mean) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_quick_gelu():
    x = jnp.asarray([0.0, 1.0, -1.0])
    expected = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(quick_gelu(x)), expected, rtol=1e-5, atol=1e-6)


# -- rope ---------------------------------------------------------------------


def test_rope_tables_formula():
    cos, sin = build_rope_tables(8, 4, theta=10000.0)
    assert cos.shape == (8, 4)
    inv = np.array([1.0, 10000.0 ** (-0.5)])
    p = 3
    np.testing.assert_allclose(
        np.asarray(cos[p]), np.cos([p * inv[0], p * inv[1]] * 2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sin[p]), np.sin([p * inv[0], p * inv[1]] * 2), rtol=1e-5
    )


def test_rotate_half():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(rotate_half(x)), [[-3.0, -4.0, 1.0, 2.0]])


def test_mla_regroup():
    x = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0, 5.0]])
    # interleaved (e0,o0,e1,o1,e2,o2) → (e0,e1,e2,o0,o1,o2)
    np.testing.assert_allclose(
        np.asarray(mla_interleave_regroup(x)), [[0.0, 2.0, 4.0, 1.0, 3.0, 5.0]]
    )


def test_apply_rope_rotation_property():
    # Rotating position-0 must be identity (cos=1, sin=0).
    cos, sin = build_rope_tables(4, 8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 1, 8)).astype(np.float32))
    out = apply_rope(x, cos[:1], sin[:1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_apply_rope_norm_preserved():
    cos, sin = build_rope_tables(16, 8)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 16, 8)).astype(np.float32))
    out = apply_rope(x, cos, sin)
    # Rotation preserves the norm of each (i, i+d/2) pair.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


# -- attention ------------------------------------------------------------------


def _naive_attention(q, k, v, mask, scale):
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = np.where(mask, scores, -1e30)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", w, v)
    b, h, s, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def test_attention_matches_naive():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    k = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    mask = np.asarray(causal_mask(6, 6, 0))[None, None]
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    expected = _naive_attention(q, k, v, mask, 1 / np.sqrt(8))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_attention_gqa_expansion():
    rng = np.random.default_rng(5)
    q = rng.normal(size=(1, 4, 3, 8)).astype(np.float32)
    k = rng.normal(size=(1, 2, 3, 8)).astype(np.float32)
    v = rng.normal(size=(1, 2, 3, 8)).astype(np.float32)
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    k_rep = np.asarray(repeat_kv(jnp.asarray(k), 2))
    v_rep = np.asarray(repeat_kv(jnp.asarray(v), 2))
    expected = _naive_attention(
        q, k_rep, v_rep, np.ones((1, 1, 3, 3), bool), 1 / np.sqrt(8)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_repeat_kv_layout():
    x = jnp.arange(2 * 2 * 1 * 1, dtype=jnp.float32).reshape(2, 2, 1, 1)
    r = np.asarray(repeat_kv(x, 2))
    # each kv head duplicated consecutively: [h0, h0, h1, h1]
    np.testing.assert_allclose(r[0, :, 0, 0], [0, 0, 1, 1])


def test_causal_mask_offset():
    m = np.asarray(causal_mask(1, 5, 2))
    np.testing.assert_array_equal(m[0], [True, True, True, False, False])


def test_attention_decode_equals_prefill_row():
    """Single-token decode over a cache must equal the corresponding
    prefill row — the invariant that keeps incremental decode exact."""
    rng = np.random.default_rng(6)
    S = 5
    q = rng.normal(size=(1, 2, S, 8)).astype(np.float32)
    k = rng.normal(size=(1, 2, S, 8)).astype(np.float32)
    v = rng.normal(size=(1, 2, S, 8)).astype(np.float32)
    full_mask = np.asarray(causal_mask(S, S, 0))[None, None]
    full = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(full_mask))
    last = attention(
        jnp.asarray(q[:, :, S - 1 :]),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(causal_mask(1, S, S - 1))[None, None],
    )
    np.testing.assert_allclose(np.asarray(last)[0, 0], np.asarray(full)[0, -1], rtol=2e-4, atol=2e-4)


# -- MoE ---------------------------------------------------------------------


def _naive_moe(tokens, weights, indices, gate_p, up_p, down_p):
    n, _ = tokens.shape
    out = np.zeros_like(tokens, dtype=np.float64)
    for t in range(n):
        for slot in range(indices.shape[1]):
            e = indices[t, slot]
            h = tokens[t] @ gate_p[e]
            u = tokens[t] @ up_p[e]
            act = h / (1 + np.exp(-h)) * u
            out[t] += weights[t, slot] * (act @ down_p[e])
    return out.astype(np.float32)


def test_moe_router_softmax_topk():
    rng = np.random.default_rng(7)
    tokens = rng.normal(size=(5, 8)).astype(np.float32)
    gate_w = rng.normal(size=(4, 8)).astype(np.float32)
    cfg = MoeConfig(num_experts=4, top_k=2, scoring="softmax")
    w, idx = moe_router(jnp.asarray(tokens), jnp.asarray(gate_w), cfg)
    logits = tokens @ gate_w.T
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    exp_idx = np.argsort(-probs, axis=-1, kind="stable")[:, :2]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(exp_idx, -1))
    np.testing.assert_allclose(
        np.asarray(w), np.take_along_axis(probs, np.asarray(idx), -1), rtol=1e-5
    )


def test_moe_router_norm_and_scaling():
    rng = np.random.default_rng(8)
    tokens = rng.normal(size=(3, 8)).astype(np.float32)
    gate_w = rng.normal(size=(4, 8)).astype(np.float32)
    cfg = MoeConfig(
        num_experts=4, top_k=2, norm_topk_prob=True, routed_scaling_factor=2.5
    )
    w, _ = moe_router(jnp.asarray(tokens), jnp.asarray(gate_w), cfg)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 2.5, rtol=1e-5)


def test_moe_router_sigmoid_with_bias():
    rng = np.random.default_rng(9)
    tokens = rng.normal(size=(3, 8)).astype(np.float32)
    gate_w = rng.normal(size=(4, 8)).astype(np.float32)
    bias = rng.normal(size=4).astype(np.float32)
    cfg = MoeConfig(num_experts=4, top_k=1, scoring="sigmoid")
    w, idx = moe_router(jnp.asarray(tokens), jnp.asarray(gate_w), cfg, jnp.asarray(bias))
    scores = 1 / (1 + np.exp(-(tokens @ gate_w.T + bias)))
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], scores.argmax(-1))


@pytest.mark.parametrize("seed", range(3))
def test_moe_apply_matches_naive(seed):
    rng = np.random.default_rng(10 + seed)
    N, H, I, E, K = 7, 8, 12, 4, 2
    tokens = rng.normal(size=(N, H)).astype(np.float32)
    gate_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    up_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    down_p = rng.normal(size=(E, I, H)).astype(np.float32) * 0.2
    weights = rng.uniform(0.1, 1.0, size=(N, K)).astype(np.float32)
    indices = rng.integers(0, E, size=(N, K)).astype(np.int32)
    out = moe_apply(
        jnp.asarray(tokens),
        jnp.asarray(weights),
        jnp.asarray(indices),
        jnp.asarray(gate_p),
        jnp.asarray(up_p),
        jnp.asarray(down_p),
    )
    expected = _naive_moe(tokens, weights, indices, gate_p, up_p, down_p)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", range(2))
def test_moe_apply_ragged_path_matches_naive(seed):
    # force the grouped-matmul path (prefill) regardless of token count
    rng = np.random.default_rng(50 + seed)
    N, H, I, E, K = 7, 8, 12, 4, 2
    tokens = rng.normal(size=(N, H)).astype(np.float32)
    gate_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    up_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    down_p = rng.normal(size=(E, I, H)).astype(np.float32) * 0.2
    weights = rng.uniform(0.1, 1.0, size=(N, K)).astype(np.float32)
    indices = rng.integers(0, E, size=(N, K)).astype(np.int32)
    out = moe_apply(
        jnp.asarray(tokens), jnp.asarray(weights), jnp.asarray(indices),
        jnp.asarray(gate_p), jnp.asarray(up_p), jnp.asarray(down_p),
        gather_threshold=0,
    )
    expected = _naive_moe(tokens, weights, indices, gate_p, up_p, down_p)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_moe_apply_unused_experts_ok():
    rng = np.random.default_rng(20)
    tokens = rng.normal(size=(2, 4)).astype(np.float32)
    E = 8
    gate_p = rng.normal(size=(E, 4, 6)).astype(np.float32)
    up_p = rng.normal(size=(E, 4, 6)).astype(np.float32)
    down_p = rng.normal(size=(E, 6, 4)).astype(np.float32)
    weights = np.ones((2, 1), dtype=np.float32)
    indices = np.array([[3], [3]], dtype=np.int32)  # only expert 3 used
    out = moe_apply(
        jnp.asarray(tokens), jnp.asarray(weights), jnp.asarray(indices),
        jnp.asarray(gate_p), jnp.asarray(up_p), jnp.asarray(down_p),
    )
    expected = _naive_moe(tokens, weights, indices, gate_p, up_p, down_p)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_swiglu_mlp_matches_naive():
    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 3, 8)).astype(np.float32)
    g = rng.normal(size=(8, 12)).astype(np.float32)
    u = rng.normal(size=(8, 12)).astype(np.float32)
    d = rng.normal(size=(12, 8)).astype(np.float32)
    out = swiglu_mlp(jnp.asarray(x), jnp.asarray(g), jnp.asarray(u), jnp.asarray(d))
    h = x @ g
    expected = (h / (1 + np.exp(-h)) * (x @ u)) @ d
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", range(2))
def test_moe_apply_dense_matches_naive(seed):
    rng = np.random.default_rng(70 + seed)
    N, H, I, E, K = 8, 8, 12, 4, 2
    tokens = rng.normal(size=(N, H)).astype(np.float32)
    gate_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    up_p = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    down_p = rng.normal(size=(E, I, H)).astype(np.float32) * 0.2
    weights = rng.uniform(0.1, 1.0, size=(N, K)).astype(np.float32)
    indices = rng.integers(0, E, size=(N, K)).astype(np.int32)
    from dsocr_tpu.ops.moe import moe_apply_dense

    out = moe_apply_dense(
        jnp.asarray(tokens), jnp.asarray(weights), jnp.asarray(indices),
        jnp.asarray(gate_p), jnp.asarray(up_p), jnp.asarray(down_p),
    )
    expected = _naive_moe(tokens, weights, indices, gate_p, up_p, down_p)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_moe_apply_q8_matches_dequantized_float():
    """The q8 decode path must match moe_apply run on the explicitly
    dequantized stacks (same math, fused dequant)."""
    from dsocr_tpu.models.deepseek.quantize import quantize_expert_stack
    from dsocr_tpu.ops.moe import dequant_q8_stack, moe_apply, moe_apply_q8

    rng = np.random.default_rng(77)
    N, H, I, E, K = 4, 32, 64, 4, 2
    tokens = rng.normal(size=(N, H)).astype(np.float32)
    gate_p = rng.normal(size=(1, E, H, I)).astype(np.float32) * 0.2
    up_p = rng.normal(size=(1, E, H, I)).astype(np.float32) * 0.2
    down_p = rng.normal(size=(1, E, I, H)).astype(np.float32) * 0.2
    weights = rng.uniform(0.1, 1.0, size=(N, K)).astype(np.float32)
    indices = rng.integers(0, E, size=(N, K)).astype(np.int32)

    def layer0(q):
        return {k: v[0] for k, v in q.items()}

    gq = layer0(quantize_expert_stack(gate_p))
    uq = layer0(quantize_expert_stack(up_p))
    dq = layer0(quantize_expert_stack(down_p))

    out_q8 = moe_apply_q8(
        jnp.asarray(tokens), jnp.asarray(weights), jnp.asarray(indices), gq, uq, dq
    )
    out_deq = moe_apply(
        jnp.asarray(tokens), jnp.asarray(weights), jnp.asarray(indices),
        dequant_q8_stack(gq).astype(jnp.float32),
        dequant_q8_stack(uq).astype(jnp.float32),
        dequant_q8_stack(dq).astype(jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out_q8), np.asarray(out_deq), rtol=5e-2, atol=5e-2
    )
