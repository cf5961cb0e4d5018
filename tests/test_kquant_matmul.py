"""Pallas Q4_K / Q6_K plane-decomposed dequant-matmul vs the NumPy
dequantize reference (ref layouts: dsq-writer/src/lib.rs:600-660;
serving path: dsq-runtime/src/lib.rs:316-369)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.dsq.quant import (
    dequantize_q4_k,
    dequantize_q6_k,
    quantize_q4_k,
    quantize_q6_k,
)
from dsocr_tpu.ops.pallas.kquant_matmul import (
    dequant_q4k_planes,
    dequant_q6k_planes,
    pack_q4_k,
    pack_q6_k,
    q4k_matmul_auto,
    q4k_matmul_layered_auto,
    q6k_matmul_auto,
    q6k_matmul_layered_auto,
)


def _w(rng, m, k, scale=0.5):
    return (rng.normal(size=(m, k)) * scale).astype(np.float32)


# -- pack fidelity: plane layout must dequantize bit-identically ----------------


@pytest.mark.parametrize("m,k", [(8, 256), (16, 512), (4, 1280)])
def test_pack_q4k_plane_dequant_bit_exact(m, k):
    rng = np.random.default_rng(m + k)
    w = _w(rng, m, k)
    payload = quantize_q4_k(w, m, k)
    ref = dequantize_q4_k(payload, m, k)
    packed = pack_q4_k(payload, m, k)
    got = np.asarray(dequant_q4k_planes(packed), np.float32)
    # f16·6-bit products are exact in f32; bf16 cast is the only rounding
    np.testing.assert_array_equal(
        got, ref.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    )


@pytest.mark.parametrize("m,k", [(8, 256), (16, 512), (4, 1280)])
def test_pack_q6k_plane_dequant_bit_exact(m, k):
    rng = np.random.default_rng(m * 3 + k)
    w = _w(rng, m, k)
    payload = quantize_q6_k(w, m, k)
    ref = dequantize_q6_k(payload, m, k)
    packed = pack_q6_k(payload, m, k)
    got = np.asarray(dequant_q6k_planes(packed), np.float32)
    np.testing.assert_array_equal(
        got, ref.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    )


# -- kernels vs host-dequant matmul ----------------------------------------------


@pytest.mark.parametrize("n,m,k", [(1, 128, 256), (4, 256, 512), (3, 128, 1280)])
def test_q4k_matmul_matches_dequant_reference(n, m, k):
    rng = np.random.default_rng(n * m + k)
    w = _w(rng, m, k)
    x = rng.normal(size=(n, k)).astype(np.float32)
    payload = quantize_q4_k(w, m, k)
    out = np.asarray(q4k_matmul_auto(jnp.asarray(x), pack_q4_k(payload, m, k)))
    expected = x @ dequantize_q4_k(payload, m, k).T
    # kernel runs the dot in bf16 (MXU); tolerance covers bf16 rounding
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


@pytest.mark.parametrize("n,m,k", [(1, 128, 256), (4, 256, 512), (3, 128, 1280)])
def test_q6k_matmul_matches_dequant_reference(n, m, k):
    rng = np.random.default_rng(n + m + k)
    w = _w(rng, m, k)
    x = rng.normal(size=(n, k)).astype(np.float32)
    payload = quantize_q6_k(w, m, k)
    out = np.asarray(q6k_matmul_auto(jnp.asarray(x), pack_q6_k(payload, m, k)))
    expected = x @ dequantize_q6_k(payload, m, k).T
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def _stack_pack(pack_fn, quantize_fn, dequantize_fn, L, m, k, rng):
    packs, deqs = [], []
    for layer in range(L):
        w = _w(rng, m, k)
        payload = quantize_fn(w, m, k)
        packs.append(pack_fn(payload, m, k))
        deqs.append(dequantize_fn(payload, m, k))
    stacked = {
        key: jnp.stack([p[key] for p in packs]) for key in packs[0]
    }
    return stacked, deqs


def test_q4k_layered_selects_layer():
    rng = np.random.default_rng(77)
    L, m, k, n = 3, 128, 256, 2
    stacked, deqs = _stack_pack(pack_q4_k, quantize_q4_k, dequantize_q4_k, L, m, k, rng)
    x = rng.normal(size=(n, k)).astype(np.float32)
    for layer in range(L):
        out = np.asarray(
            q4k_matmul_layered_auto(jnp.asarray(x), stacked, jnp.int32(layer))
        )
        np.testing.assert_allclose(out, x @ deqs[layer].T, rtol=5e-2, atol=0.2)


def test_q6k_layered_selects_layer():
    rng = np.random.default_rng(78)
    L, m, k, n = 3, 128, 256, 2
    stacked, deqs = _stack_pack(pack_q6_k, quantize_q6_k, dequantize_q6_k, L, m, k, rng)
    x = rng.normal(size=(n, k)).astype(np.float32)
    for layer in range(L):
        out = np.asarray(
            q6k_matmul_layered_auto(jnp.asarray(x), stacked, jnp.int32(layer))
        )
        np.testing.assert_allclose(out, x @ deqs[layer].T, rtol=5e-2, atol=0.2)


# -- in-major gather kernels (MoE decode path) ----------------------------------


def _inmajor_setup(quantize_fn, dequantize_fn, pack_fn, E, o, i, rng):
    w = (rng.normal(size=(E, o, i)) * 0.4).astype(np.float32)  # ggml rows per expert
    rows = w.reshape(E * o, i)
    payload = quantize_fn(rows, E * o, i)
    packed = pack_fn(payload, E, o, i)
    deq = dequantize_fn(payload, E * o, i).reshape(E, o, i)
    return packed, deq


def test_q4k_gather_matmul_matches_reference():
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        q4k_gather_matmul_auto,
    )

    rng = np.random.default_rng(11)
    E, o, i, N = 4, 128, 256, 6
    packed, deq = _inmajor_setup(
        quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor, E, o, i, rng
    )
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, i)).astype(np.float32)
    out = np.asarray(q4k_gather_matmul_auto(jnp.asarray(x), packed, jnp.asarray(idx)))
    expected = np.stack([x[n] @ deq[idx[n]].T for n in range(N)])
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_q6k_gather_matmul_matches_reference():
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q6_k_inmajor,
        q6k_gather_matmul_auto,
    )

    rng = np.random.default_rng(12)
    E, o, i, N = 4, 128, 256, 6
    packed, deq = _inmajor_setup(
        quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor, E, o, i, rng
    )
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, i)).astype(np.float32)
    out = np.asarray(q6k_gather_matmul_auto(jnp.asarray(x), packed, jnp.asarray(idx)))
    expected = np.stack([x[n] @ deq[idx[n]].T for n in range(N)])
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_q4k_gather_layered_selects_layer():
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        q4k_gather_matmul_layered_auto,
    )

    rng = np.random.default_rng(13)
    L, E, o, i, N = 2, 3, 128, 256, 4
    packs, deqs = [], []
    for l in range(L):
        p, d = _inmajor_setup(
            quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor, E, o, i, rng
        )
        packs.append(p)
        deqs.append(d)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in packs]) for k in packs[0]}
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, i)).astype(np.float32)
    for l in range(L):
        out = np.asarray(
            q4k_gather_matmul_layered_auto(
                jnp.asarray(x), stacked, jnp.asarray(idx), jnp.int32(l)
            )
        )
        expected = np.stack([x[n] @ deqs[l][idx[n]].T for n in range(N)])
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_q6k_gather_layered_selects_layer():
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q6_k_inmajor,
        q6k_gather_matmul_layered_auto,
    )

    rng = np.random.default_rng(14)
    L, E, o, i, N = 2, 3, 128, 256, 4
    packs, deqs = [], []
    for l in range(L):
        p, d = _inmajor_setup(
            quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor, E, o, i, rng
        )
        packs.append(p)
        deqs.append(d)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in packs]) for k in packs[0]}
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, i)).astype(np.float32)
    for l in range(L):
        out = np.asarray(
            q6k_gather_matmul_layered_auto(
                jnp.asarray(x), stacked, jnp.asarray(idx), jnp.int32(l)
            )
        )
        expected = np.stack([x[n] @ deqs[l][idx[n]].T for n in range(N)])
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


def test_inmajor_dequant_stack_matches_reference():
    """dequant_stack on in-major plane dicts must reproduce the host
    dequantized stack (prefill path)."""
    from dsocr_tpu.ops.moe import dequant_stack
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        pack_q6_k_inmajor,
    )

    rng = np.random.default_rng(15)
    E, o, i = 3, 64, 256
    p4, d4 = _inmajor_setup(
        quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor, E, o, i, rng
    )
    got = np.asarray(dequant_stack(p4), np.float32)  # [E, in, out]
    ref = d4.transpose(0, 2, 1).astype(np.float32)
    np.testing.assert_array_equal(
        got, ref.astype(jnp.bfloat16).astype(np.float32)
    )
    p6, d6 = _inmajor_setup(
        quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor, E, o, i, rng
    )
    got = np.asarray(dequant_stack(p6), np.float32)
    ref = d6.transpose(0, 2, 1).astype(np.float32)
    np.testing.assert_array_equal(
        got, ref.astype(jnp.bfloat16).astype(np.float32)
    )


# -- engine-level: DSOCR_QUANT=q4_k / q6_k prefill+decode consistency -------------


@pytest.mark.parametrize("method", ["q4_k", "q6_k"])
def test_kquant_engine_decode_consistency(method):
    """A k-quant-served engine (hidden 256 so k-quants are eligible)
    decodes through both prefill (dequant + grouped matmul) and decode
    (gather kernels) without shape errors, producing full-length greedy
    output; the float engine on the same weights decodes the same count."""
    import dataclasses

    import jax

    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import tiny_deepseek_config

    class FakeTokenizer:
        def encode(self, text):
            return [ord(c) % 100 for c in text]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (i % 26)) for i in ids)

        def token_to_id(self, token):
            return 127 if token == "<image>" else None

    base = tiny_deepseek_config()
    cfg = dataclasses.replace(
        base,
        projector_n_embed=256,
        language=dataclasses.replace(
            base.language,
            hidden_size=256,
            num_attention_heads=4,
            intermediate_size=256,
            moe_intermediate_size=256,
        ),
    )
    eng_f = DeepseekOcrEngine(cfg, dtype=jnp.float32, max_seq_len=512)
    eng_q = DeepseekOcrEngine(
        cfg, params=jax.tree_util.tree_map(lambda x: x, eng_f.params),
        dtype=jnp.float32, max_seq_len=512, quantize=method,
    )
    rng = np.random.default_rng(50)
    image = rng.integers(0, 256, size=(60, 60, 3), dtype=np.uint8)
    settings = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    out_f = eng_f.decode(FakeTokenizer(), "<image>q", [image], settings, params)
    out_q = eng_q.decode(FakeTokenizer(), "<image>q", [image], settings, params)
    assert len(out_q.generated_tokens) == len(out_f.generated_tokens)


# -- dense ALL-expert kernels (high-occupancy decode) ----------------------------


@pytest.mark.parametrize("method", ["q4_k", "q6_k"])
def test_kq_dense_experts_layered_matches_reference(method):
    """out[e] = x @ dequant(W[layer, e]) — every expert streamed once."""
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        pack_q6_k_inmajor,
        q4k_dense_experts_layered_auto,
        q6k_dense_experts_layered_auto,
    )

    qfn, dfn, pfn, kfn = {
        "q4_k": (quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor,
                 q4k_dense_experts_layered_auto),
        "q6_k": (quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor,
                 q6k_dense_experts_layered_auto),
    }[method]
    rng = np.random.default_rng(21)
    L, E, o, i, N = 2, 3, 128, 256, 5
    packs, deqs = [], []
    for l in range(L):
        p, d = _inmajor_setup(qfn, dfn, pfn, E, o, i, rng)
        packs.append(p)
        deqs.append(d)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in packs]) for k in packs[0]}
    x = rng.normal(size=(N, i)).astype(np.float32)
    for l in range(L):
        out = np.asarray(kfn(jnp.asarray(x), stacked, jnp.int32(l)))
        expected = np.stack([x @ deqs[l][e].T for e in range(E)])
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


@pytest.mark.parametrize("method", ["q4_k", "q6_k"])
def test_kq_dense_experts_perx_layered_matches_reference(method):
    """Per-expert-input sweep (down proj): out[e] = x[e] @ dequant(W[l,e])."""
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        pack_q6_k_inmajor,
        q4k_dense_experts_perx_layered_auto,
        q6k_dense_experts_perx_layered_auto,
    )

    qfn, dfn, pfn, kfn = {
        "q4_k": (quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor,
                 q4k_dense_experts_perx_layered_auto),
        "q6_k": (quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor,
                 q6k_dense_experts_perx_layered_auto),
    }[method]
    rng = np.random.default_rng(22)
    L, E, o, i, N = 2, 3, 128, 256, 4
    packs, deqs = [], []
    for l in range(L):
        p, d = _inmajor_setup(qfn, dfn, pfn, E, o, i, rng)
        packs.append(p)
        deqs.append(d)
    stacked = {k: jnp.stack([np.asarray(p[k]) for p in packs]) for k in packs[0]}
    x = rng.normal(size=(E, N, i)).astype(np.float32)
    out = np.asarray(kfn(jnp.asarray(x), stacked, jnp.int32(1)))
    expected = np.stack([x[e] @ deqs[1][e].T for e in range(E)])
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.2)


@pytest.mark.parametrize("method", ["q4_k", "q6_k"])
def test_moe_kq_dense_matches_gather(method):
    """At N*K > E the fused k-quant MoE dispatch switches to the dense
    all-expert sweep; it must agree with the explicit gather math."""
    from dsocr_tpu.ops.moe import (
        LayeredKQuant,
        _kq_gather,
        _split_gateup,
        moe_apply_quant_fused,
        silu,
    )
    from dsocr_tpu.ops.pallas.kquant_matmul import (
        pack_q4_k_inmajor,
        pack_q6_k_inmajor,
    )

    qfn, dfn, pfn = {
        "q4_k": (quantize_q4_k, dequantize_q4_k, pack_q4_k_inmajor),
        "q6_k": (quantize_q6_k, dequantize_q6_k, pack_q6_k_inmajor),
    }[method]
    rng = np.random.default_rng(23)
    L, E, H, I, N, K = 2, 3, 256, 256, 4, 2  # N*K=8 > E=3 → dense dispatch
    gu_packs, dn_packs = [], []
    for l in range(L):
        gp, _ = _inmajor_setup(qfn, dfn, pfn, E, 2 * I, H, rng)
        dp, _ = _inmajor_setup(qfn, dfn, pfn, E, H, I, rng)
        gu_packs.append(gp)
        dn_packs.append(dp)
    gu_arrays = {
        k: jnp.stack([np.asarray(p[k]) for p in gu_packs]) for k in gu_packs[0]
    }
    dn_arrays = {
        k: jnp.stack([np.asarray(p[k]) for p in dn_packs]) for k in dn_packs[0]
    }
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    tw = jnp.asarray(rng.random((N, K)).astype(np.float32))
    ti = jnp.asarray(rng.integers(0, E, (N, K)).astype(np.int32))

    for layer in (0, 1):
        gu_q = LayeredKQuant(gu_arrays, jnp.int32(layer), method)
        dn_q = LayeredKQuant(dn_arrays, jnp.int32(layer), method)
        dense = np.asarray(moe_apply_quant_fused(x, tw, ti, gu_q, dn_q))
        flat_idx = ti.reshape(-1)
        flat_x = jnp.repeat(x, K, axis=0)
        gus = _kq_gather(flat_x, gu_q, flat_idx)
        gates, ups = _split_gateup(gus)
        inter = (silu(gates) * ups).astype(x.dtype)
        outs = _kq_gather(inter, dn_q, flat_idx)
        expected = np.asarray(
            jnp.sum(outs.reshape(N, K, H) * tw[..., None], axis=1)
        )
        np.testing.assert_allclose(dense, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["q4_k", "q6_k"])
@pytest.mark.parametrize("fused", [True, False])
def test_moe_mixed_method_group(method, fused):
    """Regression: with k-quant serving the down stack falls back to Q8_0
    when moe_intermediate_size % 256 != 0 (serve_quant.effective_method) —
    the real deepseek geometry. moe_apply_quant(_fused) must dispatch each
    projection on its OWN method, in both the gather tier (N*K <= E) and
    the dense all-expert tier (N*K > E)."""
    from dsocr_tpu.dsq.serve_quant import quantize_expert_stack
    from dsocr_tpu.ops.linear import with_quantized
    from dsocr_tpu.ops.moe import (
        dequant_stack,
        moe_apply_quant,
        moe_apply_quant_fused,
        silu,
    )

    rng = np.random.default_rng(31)
    L, E, H, I, K = 2, 3, 256, 160, 2  # I % 256 != 0 → down falls to q8_0
    gu_w = (rng.normal(size=(L, E, H, 2 * I)) * 0.4).astype(np.float32)
    g_w, u_w = gu_w[..., :I], gu_w[..., I:]
    dn_w = (rng.normal(size=(L, E, I, H)) * 0.4).astype(np.float32)
    gu_q = quantize_expert_stack(gu_w, method)
    g_q = quantize_expert_stack(np.ascontiguousarray(g_w), method)
    u_q = quantize_expert_stack(np.ascontiguousarray(u_w), method)
    dn_q = quantize_expert_stack(dn_w, method)
    assert "codes" in dn_q and "codes" not in gu_q  # mixed methods for real

    for N in (2, 4):  # N*K = 4 ≤ E? no: E=3 → 4 > 3 dense; N=1*K=2 ≤ 3 gather
        x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
        tw = jnp.asarray(rng.random((N, K)).astype(np.float32))
        ti = jnp.asarray(rng.integers(0, E, (N, K)).astype(np.int32))
        for layer in (0, 1):
            if fused:
                views = with_quantized(
                    {}, {"gu": gu_q, "dn": dn_q}, jnp.int32(layer)
                )
                got = np.asarray(
                    moe_apply_quant_fused(x, tw, ti, views["gu"], views["dn"])
                )
                gu_f = dequant_stack(views["gu"]).astype(jnp.float32)
                gus = jnp.einsum("nh,ehm->enm", x, gu_f)
                gates, ups = jnp.split(gus, 2, axis=-1)
            else:
                views = with_quantized(
                    {}, {"g": g_q, "u": u_q, "dn": dn_q}, jnp.int32(layer)
                )
                got = np.asarray(
                    moe_apply_quant(
                        x, tw, ti, views["g"], views["u"], views["dn"]
                    )
                )
                g_f = dequant_stack(views["g"]).astype(jnp.float32)
                u_f = dequant_stack(views["u"]).astype(jnp.float32)
                gates = jnp.einsum("nh,ehm->enm", x, g_f)
                ups = jnp.einsum("nh,ehm->enm", x, u_f)
            inter = (silu(gates) * ups).astype(x.dtype)
            outs = jnp.einsum(
                "enk,ekm->enm",
                inter,
                dequant_stack(views["dn"]).astype(jnp.float32),
            )  # [E, N, H]
            sel = jnp.take_along_axis(
                outs.transpose(1, 0, 2), ti[..., None], axis=1
            )
            expected = np.asarray(jnp.sum(sel * tw[..., None], axis=1))
            # expected dequantizes via bf16 (dequant_stack) while the
            # kernels dequantize in f32 VMEM — tolerance covers that gap
            np.testing.assert_allclose(got, expected, rtol=5e-2, atol=2.0)
