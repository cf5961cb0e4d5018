"""Paged decode attention kernel vs the contiguous oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.ops.pallas.paged_attention import (
    paged_decode_attention_auto,
    paged_decode_attention_reference,
)


def _setup(seed, B=3, H=4, H_kv=4, D=16, L=2, P=16, page=8, P_max=4):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    k_pool = jnp.asarray(rng.normal(size=(L, P, H_kv, page, D)).astype(np.float32))
    v_pool = jnp.asarray(rng.normal(size=(L, P, H_kv, page, D)).astype(np.float32))
    # distinct page ids per row
    ids = rng.permutation(P)[: B * P_max].reshape(B, P_max)
    tables = jnp.asarray(ids.astype(np.int32))
    return q, k_pool, v_pool, tables


@pytest.mark.parametrize("lengths", [[0, 7, 8], [15, 22, 31], [3, 3, 3]])
def test_paged_matches_reference(lengths):
    q, k_pool, v_pool, tables = _setup(0)
    lens = jnp.asarray(lengths, jnp.int32)
    for layer in (0, 1):
        got = paged_decode_attention_auto(
            q, k_pool, v_pool, tables, lens, jnp.int32(layer), scale=0.25
        )
        want = paged_decode_attention_reference(
            q, k_pool, v_pool, tables, lens, layer, scale=0.25
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_paged_gqa():
    q, k_pool, v_pool, tables = _setup(1, H=8, H_kv=2)
    lens = jnp.asarray([5, 12, 30], jnp.int32)
    got = paged_decode_attention_auto(
        q, k_pool, v_pool, tables, lens, jnp.int32(1), scale=0.25
    )
    want = paged_decode_attention_reference(
        q, k_pool, v_pool, tables, lens, 1, scale=0.25
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_ignores_unused_page_contents():
    """Pages beyond a row's length must not affect the output (the index
    map clamps to the last used page; contributions are masked)."""
    q, k_pool, v_pool, tables = _setup(2)
    lens = jnp.asarray([9, 9, 9], jnp.int32)  # uses 2 of 4 table pages
    base = paged_decode_attention_auto(
        q, k_pool, v_pool, tables, lens, jnp.int32(0), scale=0.25
    )
    # poison every page NOT referenced by the first two table entries
    used = set(np.asarray(tables[:, :2]).ravel().tolist())
    poison = np.asarray(k_pool).copy()
    for p in range(poison.shape[1]):
        if p not in used:
            poison[:, p] = 1e4
    got = paged_decode_attention_auto(
        jnp.asarray(q), jnp.asarray(poison), v_pool, tables, lens,
        jnp.int32(0), scale=0.25,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-6, atol=2e-6)


def test_paged_int8_matches_reference():
    """int8 pool: per-token scales fold into scores/weights in-kernel."""
    rng = np.random.default_rng(5)
    B, H, H_kv, D, L, P, page, P_max = 3, 4, 2, 16, 2, 16, 8, 4
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    k_pool = jnp.asarray(rng.integers(-127, 128, size=(L, P, H_kv, page, D)), jnp.int8)
    v_pool = jnp.asarray(rng.integers(-127, 128, size=(L, P, H_kv, page, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, P, H_kv, page)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, P, H_kv, page)), jnp.float32)
    tables = jnp.asarray(rng.permutation(P)[: B * P_max].reshape(B, P_max).astype(np.int32))
    lens = jnp.asarray([0, 13, 31], jnp.int32)
    for layer in (0, 1):
        got = paged_decode_attention_auto(
            q, k_pool, v_pool, tables, lens, jnp.int32(layer), scale=0.25,
            ks_pool=ks, vs_pool=vs,
        )
        want = paged_decode_attention_reference(
            q, k_pool, v_pool, tables, lens, layer, scale=0.25,
            ks_pool=ks, vs_pool=vs,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_kv_update_matches_scatter(quant):
    """paged_kv_update (aliased in-place Pallas write) == the XLA scatter."""
    from dsocr_tpu.ops.pallas.paged_attention import paged_kv_update

    rng = np.random.default_rng(5)
    L, P, NKV, page, D, Dv, B, P_max = 3, 12, 2, 128, 64, 64, 4, 3
    if quant:
        k_pool = jnp.asarray(rng.integers(-127, 128, (L, P, NKV, page, D)), jnp.int8)
        v_pool = jnp.asarray(rng.integers(-127, 128, (L, P, NKV, page, Dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, P, NKV, page)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, P, NKV, page)), jnp.float32)
        k_new = jnp.asarray(rng.integers(-127, 128, (B, NKV, D)), jnp.int8)
        v_new = jnp.asarray(rng.integers(-127, 128, (B, NKV, Dv)), jnp.int8)
        ks_new = jnp.asarray(rng.uniform(0.01, 0.1, (B, NKV)), jnp.float32)
        vs_new = jnp.asarray(rng.uniform(0.01, 0.1, (B, NKV)), jnp.float32)
    else:
        k_pool = jnp.asarray(rng.normal(size=(L, P, NKV, page, D)), jnp.float32)
        v_pool = jnp.asarray(rng.normal(size=(L, P, NKV, page, Dv)), jnp.float32)
        ks = vs = ks_new = vs_new = None
        k_new = jnp.asarray(rng.normal(size=(B, NKV, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, NKV, Dv)), jnp.float32)
    # distinct pages per row (rows never share a write page)
    tables = jnp.asarray(
        rng.permutation(P)[: B * P_max].reshape(B, P_max), jnp.int32
    )
    lengths = jnp.asarray(rng.integers(0, page * P_max, (B,)), jnp.int32)
    li = jnp.asarray(2, jnp.int32)

    k2, v2, ks2, vs2 = paged_kv_update(
        k_pool, v_pool, ks, vs, k_new, v_new, ks_new, vs_new, tables,
        lengths, li, interpret=True,
    )
    rows = jnp.arange(B)
    pids = tables[rows, lengths // page]
    offs = lengths % page
    np.testing.assert_array_equal(
        np.asarray(k2), np.asarray(k_pool.at[li, pids, :, offs, :].set(k_new))
    )
    np.testing.assert_array_equal(
        np.asarray(v2), np.asarray(v_pool.at[li, pids, :, offs, :].set(v_new))
    )
    if quant:
        np.testing.assert_array_equal(
            np.asarray(ks2), np.asarray(ks.at[li, pids, :, offs].set(ks_new))
        )
        np.testing.assert_array_equal(
            np.asarray(vs2), np.asarray(vs.at[li, pids, :, offs].set(vs_new))
        )
