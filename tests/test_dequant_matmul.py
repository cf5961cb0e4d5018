"""Pallas Q8_0 dequant-matmul vs NumPy dequantize reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.dsq.quant import dequantize_q8_0, quantize_q8_0
from dsocr_tpu.ops.pallas.dequant_matmul import pack_q8_0, q8_matmul_auto


@pytest.mark.parametrize("n,m,k", [(1, 64, 128), (4, 128, 256), (2, 96, 64)])
def test_q8_matmul_matches_dequant_reference(n, m, k):
    rng = np.random.default_rng(n * m + k)
    w = (rng.normal(size=(m, k)) * 0.5).astype(np.float32)
    x = rng.normal(size=(n, k)).astype(np.float32)
    payload = quantize_q8_0(w, m, k)
    codes, scales = pack_q8_0(payload, m, k)
    out = np.asarray(q8_matmul_auto(jnp.asarray(x), codes, scales))
    expected = x @ dequantize_q8_0(payload, m, k).T
    # kernel runs the dot in bf16 (MXU); tolerance covers bf16 rounding
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_pack_q8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    payload = quantize_q8_0(w, 8, 64)
    codes, scales = pack_q8_0(payload, 8, 64)
    deq = np.asarray(codes, np.float32) * np.repeat(np.asarray(scales), 32, axis=1)
    np.testing.assert_allclose(deq, dequantize_q8_0(payload, 8, 64), rtol=1e-6)


def test_q8_gather_matmul_matches_reference():
    from dsocr_tpu.ops.pallas.dequant_matmul import q8_gather_matmul_auto

    rng = np.random.default_rng(5)
    E, H, M, N = 5, 64, 48, 7
    w = rng.normal(size=(E, M, H)).astype(np.float32)  # ggml [out, in] rows
    idx = rng.integers(0, E, size=(N,)).astype(np.int32)
    x = rng.normal(size=(N, H)).astype(np.float32)

    codes_list, scales_list, deq = [], [], []
    for e in range(E):
        payload = quantize_q8_0(w[e], M, H)
        c, s = pack_q8_0(payload, M, H)
        codes_list.append(np.asarray(c).T)  # → [H, M] in-major
        scales_list.append(np.asarray(s).T)  # → [H/32, M]
        deq.append(dequantize_q8_0(payload, M, H))
    codes = jnp.asarray(np.stack(codes_list))
    scales = jnp.asarray(np.stack(scales_list))

    out = np.asarray(q8_gather_matmul_auto(jnp.asarray(x), codes, scales, jnp.asarray(idx)))
    expected = np.stack([x[n] @ deq[idx[n]].T for n in range(N)])
    # kernel runs the dot in bf16 (MXU); tolerance covers bf16 rounding
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_q8_requantize_roundtrip_bit_exact():
    """quantize(dequantize(q8_payload)) reproduces the original codes and
    scales bit-for-bit: the amax element always maps to ±127, so the f16
    scale round-trips exactly. This makes serving a Q8_0 snapshot via
    runtime re-quantization equivalent to keeping the packed records."""
    from dsocr_tpu.models.deepseek.quantize import quantize_plain

    rng = np.random.default_rng(11)
    M, K = 16, 96
    w = (rng.normal(size=(M, K)) * rng.uniform(0.01, 3.0, size=(M, 1))).astype(
        np.float32
    )
    w[3] = 0.0  # zero block path
    payload = quantize_q8_0(w, M, K)
    codes0, scales0 = pack_q8_0(payload, M, K)
    deq = dequantize_q8_0(payload, M, K)  # [M, K] floats, layout [out, in]

    q = quantize_plain(deq.T)  # quantize_plain takes [in, out]
    np.testing.assert_array_equal(np.asarray(q["codes"]), np.asarray(codes0))
    np.testing.assert_array_equal(np.asarray(q["scales"]), np.asarray(scales0))


def test_q8_dense_experts_layered_matches_reference():
    """Dense all-expert sweep: out[e] = x @ dequant(W[layer, e])."""
    from dsocr_tpu.ops.pallas.dequant_matmul import (
        q8_dense_experts_layered_auto,
    )

    rng = np.random.default_rng(9)
    L, E, H, M, N = 3, 4, 64, 48, 5
    w = rng.normal(size=(L, E, M, H)).astype(np.float32)
    x = rng.normal(size=(N, H)).astype(np.float32)
    codes = np.zeros((L, E, H, M), np.int8)
    scales = np.zeros((L, E, H // 32, M), np.float32)
    deq = np.zeros((L, E, M, H), np.float32)
    for l in range(L):
        for e in range(E):
            payload = quantize_q8_0(w[l, e], M, H)
            c, s = pack_q8_0(payload, M, H)
            codes[l, e] = np.asarray(c).T
            scales[l, e] = np.asarray(s).T
            deq[l, e] = dequantize_q8_0(payload, M, H)
    for layer in (0, 2):
        out = np.asarray(
            q8_dense_experts_layered_auto(
                jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scales),
                jnp.int32(layer),
            )
        )
        expected = np.stack([x @ deq[layer, e].T for e in range(E)])
        np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_q8_dense_experts_perx_layered_matches_reference():
    """Per-expert-input sweep (down proj): out[e] = x[e] @ dequant(W[l,e])."""
    from dsocr_tpu.ops.pallas.dequant_matmul import (
        q8_dense_experts_perx_layered_auto,
    )

    rng = np.random.default_rng(10)
    L, E, K, M, N = 2, 3, 64, 32, 4
    w = rng.normal(size=(L, E, M, K)).astype(np.float32)
    x = rng.normal(size=(E, N, K)).astype(np.float32)
    codes = np.zeros((L, E, K, M), np.int8)
    scales = np.zeros((L, E, K // 32, M), np.float32)
    deq = np.zeros((L, E, M, K), np.float32)
    for l in range(L):
        for e in range(E):
            payload = quantize_q8_0(w[l, e], M, K)
            c, s = pack_q8_0(payload, M, K)
            codes[l, e] = np.asarray(c).T
            scales[l, e] = np.asarray(s).T
            deq[l, e] = dequantize_q8_0(payload, M, K)
    out = np.asarray(
        q8_dense_experts_perx_layered_auto(
            jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scales), jnp.int32(1)
        )
    )
    expected = np.stack([x[e] @ deq[1, e].T for e in range(E)])
    np.testing.assert_allclose(out, expected, rtol=5e-2, atol=0.15)


def test_moe_q8_dense_matches_gather():
    """At N*K > E the fused q8 MoE switches to the dense sweep; both
    paths must agree (same packed weights, same routing)."""
    from dsocr_tpu.ops.moe import (
        LayeredQ8,
        moe_apply_q8_dense_fused,
        moe_apply_q8_fused,
    )

    rng = np.random.default_rng(11)
    L, E, H, I, N, K = 2, 4, 64, 32, 6, 2  # N*K=12 > E=4 → dense dispatch
    gu = rng.normal(size=(L, E, 2 * I, H)).astype(np.float32)
    dn = rng.normal(size=(L, E, H, I)).astype(np.float32)

    def pack(stack, out_dim, in_dim):
        codes = np.zeros((L, E, in_dim, out_dim), np.int8)
        scales = np.zeros((L, E, in_dim // 32, out_dim), np.float32)
        for l in range(L):
            for e in range(E):
                payload = quantize_q8_0(stack[l, e], out_dim, in_dim)
                c, s = pack_q8_0(payload, out_dim, in_dim)
                codes[l, e] = np.asarray(c).T
                scales[l, e] = np.asarray(s).T
        return jnp.asarray(codes), jnp.asarray(scales)

    gu_c, gu_s = pack(gu, 2 * I, H)
    dn_c, dn_s = pack(dn, H, I)
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    tw = jnp.asarray(rng.random((N, K)).astype(np.float32))
    ti = jnp.asarray(rng.integers(0, E, (N, K)).astype(np.int32))

    for layer in (0, 1):
        gu_q = LayeredQ8(gu_c, gu_s, jnp.int32(layer))
        dn_q = LayeredQ8(dn_c, dn_s, jnp.int32(layer))
        dense = np.asarray(moe_apply_q8_dense_fused(x, tw, ti, gu_q, dn_q))
        via_dispatch = np.asarray(moe_apply_q8_fused(x, tw, ti, gu_q, dn_q))
        np.testing.assert_allclose(dense, via_dispatch, rtol=1e-5, atol=1e-5)
        # and both match the explicit per-selection gather math
        from dsocr_tpu.ops.pallas.dequant_matmul import (
            q8_gather_matmul_layered_auto,
        )
        from dsocr_tpu.ops.moe import silu

        flat_idx = ti.reshape(-1)
        flat_x = jnp.repeat(x, K, axis=0)
        gus = q8_gather_matmul_layered_auto(flat_x, gu_c, gu_s, flat_idx, layer)
        g, u = gus[..., :I], gus[..., I:]
        inter = (silu(g) * u).astype(x.dtype)
        outs = q8_gather_matmul_layered_auto(inter, dn_c, dn_s, flat_idx, layer)
        gather = np.asarray(
            jnp.sum(outs.reshape(N, K, H) * tw[..., None], axis=1)
        )
        np.testing.assert_allclose(dense, gather, rtol=5e-2, atol=0.15)


def test_expand_modes_agree_and_fast_is_exact():
    """Both scale-expansion modes (DSOCR_Q8_EXPAND) produce the same
    result in interpret mode, and 'fast' matches the exact
    bf16(q * s_f32) dequant bitwise. On real TPU only 'fast' is exact:
    the 0/1 f32 expansion matmul silently rounds scales to bf16 (TPU
    f32 matmuls are bf16 multiplies), measured up to 0.3 abs off the
    exact dequant at decode geometry — see /tmp note in r3 journal."""
    import jax
    import ml_dtypes
    from dsocr_tpu.ops.pallas.dequant_matmul import (
        q8_dense_experts_layered,
        q8_matmul,
        q8_matmul_layered,
    )

    rng = np.random.default_rng(11)
    N, K, M, L, E = 8, 128, 128, 2, 3
    interp = jax.default_backend() != "tpu"
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    def ref_out_major(q, s):  # w[m, k] = q * s[m, k//32]
        sf = np.repeat(s, 32, axis=-1)
        w = (q.astype(np.float32) * sf).astype(ml_dtypes.bfloat16)
        return np.asarray(x, np.float32) @ w.astype(np.float32).T

    codes = rng.integers(-127, 128, (M, K), dtype=np.int8)
    scales = (rng.standard_normal((M, K // 32)) * 0.02).astype(
        np.float16).astype(np.float32)
    fast = np.asarray(q8_matmul(
        x, jnp.asarray(codes), jnp.asarray(scales),
        interpret=interp, expand="fast"))
    slow = np.asarray(q8_matmul(
        x, jnp.asarray(codes), jnp.asarray(scales),
        interpret=interp, expand="matmul"))
    ref = ref_out_major(codes, scales)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(slow, ref, rtol=1e-5, atol=1e-5)

    lcodes = rng.integers(-127, 128, (L, M, K), dtype=np.int8)
    lscales = (rng.standard_normal((L, M, K // 32)) * 0.02).astype(
        np.float16).astype(np.float32)
    for mode in ("fast", "matmul"):
        out = np.asarray(q8_matmul_layered(
            x, jnp.asarray(lcodes), jnp.asarray(lscales),
            jnp.asarray(1, jnp.int32), interpret=interp, expand=mode))
        np.testing.assert_allclose(
            out, ref_out_major(lcodes[1], lscales[1]), rtol=1e-5, atol=1e-5)

    dcodes = rng.integers(-127, 128, (L, E, K, M), dtype=np.int8)
    dscales = (rng.standard_normal((L, E, K // 32, M)) * 0.02).astype(
        np.float16).astype(np.float32)

    def ref_in_major(q, s):  # w[k, m] = q * s[k//32, m]
        sf = np.repeat(s, 32, axis=0)
        w = (q.astype(np.float32) * sf).astype(ml_dtypes.bfloat16)
        return np.asarray(x, np.float32) @ w.astype(np.float32)

    for mode in ("fast", "matmul"):
        out = np.asarray(q8_dense_experts_layered(
            x, jnp.asarray(dcodes), jnp.asarray(dscales),
            jnp.asarray(0, jnp.int32), interpret=interp, expand=mode))
        exp = np.stack([ref_in_major(dcodes[0, e], dscales[0, e])
                        for e in range(E)])
        np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_dequant_diagnostic_modes():
    """expand='bf16' (all-bf16 dequant, one fewer VPU pass) stays within
    bf16-scale rounding of the exact path; expand='none' (ceiling probe)
    computes x @ q with unit scales — both sublane-oriented kernels."""
    import jax
    from dsocr_tpu.ops.pallas.dequant_matmul import (
        q8_dense_experts_layered,
        q8_dense_experts_perx_layered,
    )

    rng = np.random.default_rng(5)
    L, E, H, M, N = 2, 3, 128, 128, 8
    interp = jax.default_backend() != "tpu"
    codes = rng.integers(-127, 128, (L, E, H, M), dtype=np.int8)
    scales = (rng.standard_normal((L, E, H // 32, M)) * 0.02).astype(
        np.float16).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)

    args = (x, jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(1, jnp.int32))
    exact = np.asarray(q8_dense_experts_layered(
        *args, interpret=interp, expand="fast"))
    b16 = np.asarray(q8_dense_experts_layered(
        *args, interpret=interp, expand="bf16"))
    scale_mag = np.abs(exact).max()
    assert np.abs(exact - b16).max() <= 0.01 * scale_mag

    none = np.asarray(q8_dense_experts_layered(
        *args, interpret=interp, expand="none"))
    unit = np.stack([
        np.asarray(x, np.float32) @ codes[1, e].astype(np.float32)
        for e in range(E)
    ])
    np.testing.assert_allclose(none, unit, rtol=1e-2, atol=1e-2 * np.abs(unit).max())

    # per-expert-x (down projection) orientation
    xe = jnp.asarray(rng.standard_normal((E, N, H)), jnp.bfloat16)
    pargs = (xe, jnp.asarray(codes), jnp.asarray(scales),
             jnp.asarray(0, jnp.int32))
    pexact = np.asarray(q8_dense_experts_perx_layered(
        *pargs, interpret=interp, expand="fast"))
    pb16 = np.asarray(q8_dense_experts_perx_layered(
        *pargs, interpret=interp, expand="bf16"))
    assert np.abs(pexact - pb16).max() <= 0.01 * np.abs(pexact).max()


def test_q8_megafused_matches_two_kernel_sweep(monkeypatch):
    """The mega-fused expert kernel (gate+up → silu·up → down → weighted
    accumulate in one Pallas call) must match the two-kernel dense sweep
    it replaces, including multi-chunk in-kernel dequant (H=768 → two
    down chunks, 2*MI=512 → two gate+up chunks) and duplicate experts in
    a row's top-k (the dense-weight scatter ADDS like the
    take_along_axis combine)."""
    from dsocr_tpu.ops.moe import LayeredQ8, moe_apply_q8_dense_fused

    rng = np.random.default_rng(23)
    L, E, H, I, N, K = 2, 4, 768, 256, 16, 3
    gu = rng.normal(size=(L, E, 2 * I, H)).astype(np.float32) * 0.3
    dn = rng.normal(size=(L, E, H, I)).astype(np.float32) * 0.3

    def pack(stack, out_dim, in_dim):
        codes = np.zeros((L, E, in_dim, out_dim), np.int8)
        scales = np.zeros((L, E, in_dim // 32, out_dim), np.float32)
        for l in range(L):
            for e in range(E):
                payload = quantize_q8_0(stack[l, e], out_dim, in_dim)
                c, s = pack_q8_0(payload, out_dim, in_dim)
                codes[l, e] = np.asarray(c).T
                scales[l, e] = np.asarray(s).T
        return jnp.asarray(codes), jnp.asarray(scales)

    gu_c, gu_s = pack(gu, 2 * I, H)
    dn_c, dn_s = pack(dn, H, I)
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) * 0.3)
    tw = jnp.asarray(rng.random((N, K)).astype(np.float32))
    ti_np = rng.integers(0, E, (N, K)).astype(np.int32)
    ti_np[0, :2] = 1  # duplicate expert within one row's top-k
    ti = jnp.asarray(ti_np)

    for layer in (0, 1):
        gu_q = LayeredQ8(gu_c, gu_s, jnp.int32(layer))
        dn_q = LayeredQ8(dn_c, dn_s, jnp.int32(layer))
        monkeypatch.setenv("DSOCR_Q8_MEGAFUSED", "0")
        two_kernel = np.asarray(
            moe_apply_q8_dense_fused(x, tw, ti, gu_q, dn_q)
        )
        monkeypatch.setenv("DSOCR_Q8_MEGAFUSED", "1")
        fused = np.asarray(moe_apply_q8_dense_fused(x, tw, ti, gu_q, dn_q))
        np.testing.assert_allclose(fused, two_kernel, rtol=2e-5, atol=2e-5)
