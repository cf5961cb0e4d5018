"""int8-quantized slot KV cache: op accuracy + end-to-end slot serving.

The reference keeps KV in model dtype (core/src/cache.rs:15); int8 KV is
a TPU serving addition (decode streams the whole static cache per step —
codes+scales halve that HBM traffic). Scales commute out of both
attention dots, so score-side dequant is numerically at least as good as
dequantize-then-attend.
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_quantize_kv_int8_roundtrip_accuracy():
    from dsocr_tpu.ops.attention import quantize_kv_int8

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 32)).astype(np.float32)
    codes, scale = quantize_kv_int8(jnp.asarray(x))
    deq = np.asarray(codes, np.float32) * np.asarray(scale)[..., None]
    err = np.abs(deq - x).max() / np.abs(x).max()
    assert err < 1.0 / 127  # symmetric max-abs: error bounded by scale/2
    # zero rows stay exactly zero (safe-scale path)
    z_codes, z_scale = quantize_kv_int8(jnp.zeros((1, 1, 3, 8)))
    assert np.all(np.asarray(z_codes) == 0)
    assert np.all(np.asarray(z_scale) == 0)


def test_attention_kv_int8_matches_dequantized_attention():
    from dsocr_tpu.ops.attention import (
        attention,
        attention_kv_int8,
        quantize_kv_int8,
    )

    rng = np.random.default_rng(1)
    B, H, S, D = 3, 4, 24, 32
    q = rng.normal(size=(B, H, 1, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    lengths = np.array([5, 24, 13], np.int32)
    mask = (np.arange(S)[None, None, None, :] < lengths[:, None, None, None])

    kc, ks = quantize_kv_int8(jnp.asarray(k))
    vc, vs = quantize_kv_int8(jnp.asarray(v))
    deq_k = np.asarray(kc, np.float32) * np.asarray(ks)[..., None]
    deq_v = np.asarray(vc, np.float32) * np.asarray(vs)[..., None]

    ref = np.asarray(
        attention(
            jnp.asarray(q), jnp.asarray(deq_k), jnp.asarray(deq_v),
            jnp.asarray(mask),
        )
    )
    got = np.asarray(
        attention_kv_int8(
            jnp.asarray(q), kc, ks, vc, vs, jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def _tiny_engine(kv_quant=None):
    import dataclasses

    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import tiny_deepseek_config

    cfg = tiny_deepseek_config()
    return DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512, kv_quant=kv_quant
    )


class _Tok:
    def encode(self, t):
        return [ord(c) % 100 for c in t]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))

    def token_to_id(self, t):
        return 127 if t == "<image>" else None


def test_slot_serving_with_int8_kv_cache():
    """End-to-end: int8-KV engine serves full-length generations through
    the continuous scheduler; greedy tokens match the float-KV engine
    (tiny random-init logit margins dwarf the int8 quantization error)."""
    import asyncio

    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.server.scheduler import ContinuousScheduler

    rng = np.random.default_rng(3)
    images = [
        rng.integers(0, 256, size=(60, 60, 3), dtype=np.uint8) for _ in range(3)
    ]
    params = DecodeParameters(max_new_tokens=8, no_repeat_ngram_size=None)
    settings = VisionSettings(64, 64, False)

    def serve(kv_quant):
        eng = _tiny_engine(kv_quant)
        sched = ContinuousScheduler(eng, _Tok(), n_slots=2, max_len=256)

        async def run():
            return await asyncio.gather(*(
                sched.submit("<image>q", [img], settings, params)
                for img in images
            ))

        return asyncio.run(run())

    outs_f = serve(None)
    outs_q = serve("int8")
    for of, oq in zip(outs_f, outs_q):
        assert len(oq.generated_tokens) == len(of.generated_tokens)
        assert oq.generated_tokens == of.generated_tokens
