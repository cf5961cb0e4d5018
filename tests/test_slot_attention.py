"""Fused slot decode-attention kernel (ops/pallas/slot_attention.py)
vs the XLA einsum oracles (ops/attention.py), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsocr_tpu.ops.attention import attention, attention_kv_int8
from dsocr_tpu.ops.pallas.slot_attention import slot_decode_attention


def _case(seed, B, NH, NKV, S, D, Dv, quant):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, NH, 1, D)), jnp.float32)
    if quant:
        k_all = jnp.asarray(
            rng.integers(-127, 128, size=(3, B, NKV, S, D)), jnp.int8
        )
        v_all = jnp.asarray(
            rng.integers(-127, 128, size=(3, B, NKV, S, Dv)), jnp.int8
        )
        ks = jnp.asarray(rng.uniform(0.01, 0.1, size=(3, B, NKV, S)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, size=(3, B, NKV, S)), jnp.float32)
    else:
        k_all = jnp.asarray(rng.normal(size=(3, B, NKV, S, D)), jnp.float32)
        v_all = jnp.asarray(rng.normal(size=(3, B, NKV, S, Dv)), jnp.float32)
        ks = vs = None
    lengths = jnp.asarray(rng.integers(0, S, size=(B,)), jnp.int32)
    return q, k_all, v_all, ks, vs, lengths


def _oracle(q, k_all, v_all, ks, vs, layer, lengths, scale):
    S = k_all.shape[3]
    mask = (
        jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
        <= lengths[:, None, None, None]
    )
    if ks is not None:
        return attention_kv_int8(
            q, k_all[layer], ks[layer], v_all[layer], vs[layer], mask, scale
        )
    return attention(q, k_all[layer], v_all[layer], mask, scale)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize(
    "B,NH,NKV,S,D,Dv",
    [
        (4, 4, 4, 256, 64, 64),   # MHA
        (3, 8, 2, 384, 64, 64),   # GQA group=4
        (2, 6, 3, 128, 128, 128),
    ],
)
def test_kernel_matches_oracle(quant, B, NH, NKV, S, D, Dv):
    q, k_all, v_all, ks, vs, lengths = _case(7 + B, B, NH, NKV, S, D, Dv, quant)
    scale = 1.0 / (D ** 0.5)
    for layer in (0, 2):
        got = slot_decode_attention(
            q, k_all, v_all, ks, vs, jnp.int32(layer), lengths,
            scale=scale, interpret=True,
        )
        want = _oracle(q, k_all, v_all, ks, vs, layer, lengths, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_kernel_length_edges():
    B, NH, NKV, S, D = 3, 2, 2, 256, 64
    q, k_all, v_all, _, _, _ = _case(99, B, NH, NKV, S, D, D, False)
    scale = 1.0 / (D ** 0.5)
    # row 0 attends only position 0; row 2 attends the whole row
    lengths = jnp.asarray([0, 100, S - 1], jnp.int32)
    got = slot_decode_attention(
        q, k_all, v_all, None, None, jnp.int32(1), lengths,
        scale=scale, interpret=True,
    )
    want = _oracle(q, k_all, v_all, None, None, 1, lengths, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # row 0's output is exactly v[..., 0, :] (softmax over one position)
    v0 = np.asarray(v_all[1, 0, :, 0, :]).reshape(-1)
    np.testing.assert_allclose(np.asarray(got)[0, 0], v0, rtol=1e-6, atol=1e-6)


def test_slot_decode_end_to_end_with_kernel(monkeypatch):
    """The slot runtime produces identical tokens with the kernel forced
    on (interpret) and forced off — same f32 math, tiny model."""
    import asyncio

    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import tiny_deepseek_config

    class Tok:
        def encode(self, text):
            return [ord(c) % 100 for c in text]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (i % 26)) for i in ids)

        def token_to_id(self, token):
            return 127 if token == "<image>" else None

    vs = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None)
    img = np.random.default_rng(3).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    tok = Tok()

    def run(flag):
        monkeypatch.setenv("DSOCR_SLOT_ATTN_KERNEL", flag)
        engine = DeepseekOcrEngine(
            tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=512
        )
        runner = engine.make_slot_runner()
        cache = engine.new_slot_cache(2, 256)
        state = runner.init_state(cache, context_len=256)
        pre = engine.prefill_for_slot(tok, "<image>ker", [img], vs)
        state, fin, first = runner.join(
            state, 0, pre["row_k"], pre["row_v"], pre["prompt_ids"],
            pre["logits"], params, 6, pos0=pre["pos0"],
        )
        assert not fin
        state = runner.run_chunk(engine.params, state, 6)
        return runner.harvest(state).generated(0)

    toks_kernel = run("1")
    toks_einsum = run("0")
    assert toks_kernel == toks_einsum


@pytest.mark.parametrize("quant", [False, True])
def test_kv_update_matches_scatter(quant):
    """slot_kv_update (aliased in-place Pallas write) == the XLA scatter."""
    from dsocr_tpu.ops.pallas.slot_attention import slot_kv_update

    rng = np.random.default_rng(3)
    L, B, NKV, S, D, Dv = 3, 4, 2, 256, 64, 64
    if quant:
        k_all = jnp.asarray(rng.integers(-127, 128, (L, B, NKV, S, D)), jnp.int8)
        v_all = jnp.asarray(rng.integers(-127, 128, (L, B, NKV, S, Dv)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, NKV, S)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, NKV, S)), jnp.float32)
        k_new = jnp.asarray(rng.integers(-127, 128, (B, NKV, D)), jnp.int8)
        v_new = jnp.asarray(rng.integers(-127, 128, (B, NKV, Dv)), jnp.int8)
        ks_new = jnp.asarray(rng.uniform(0.01, 0.1, (B, NKV)), jnp.float32)
        vs_new = jnp.asarray(rng.uniform(0.01, 0.1, (B, NKV)), jnp.float32)
    else:
        k_all = jnp.asarray(rng.normal(size=(L, B, NKV, S, D)), jnp.float32)
        v_all = jnp.asarray(rng.normal(size=(L, B, NKV, S, Dv)), jnp.float32)
        ks = vs = ks_new = vs_new = None
        k_new = jnp.asarray(rng.normal(size=(B, NKV, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, NKV, Dv)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, S, (B,)), jnp.int32)
    li = jnp.asarray(1, jnp.int32)

    k2, v2, ks2, vs2 = slot_kv_update(
        k_all, v_all, ks, vs, k_new, v_new, ks_new, vs_new, li, lengths,
        interpret=True,
    )
    rows = jnp.arange(B)
    np.testing.assert_array_equal(
        np.asarray(k2), np.asarray(k_all.at[li, rows, :, lengths, :].set(k_new))
    )
    np.testing.assert_array_equal(
        np.asarray(v2), np.asarray(v_all.at[li, rows, :, lengths, :].set(v_new))
    )
    if quant:
        np.testing.assert_array_equal(
            np.asarray(ks2), np.asarray(ks.at[li, rows, :, lengths].set(ks_new))
        )
        np.testing.assert_array_equal(
            np.asarray(vs2), np.asarray(vs.at[li, rows, :, lengths].set(vs_new))
        )
