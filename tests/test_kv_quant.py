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


def test_attention_kv_int8_gqa_matches_dequantized_attention():
    """GQA path (H_kv < H): grouped-einsum int8 attention vs repeat_kv
    dequantized reference."""
    from dsocr_tpu.ops.attention import (
        attention,
        attention_kv_int8,
        quantize_kv_int8,
    )

    rng = np.random.default_rng(2)
    B, NH, NKV, S, D = 2, 8, 2, 24, 16
    q = rng.normal(size=(B, NH, 1, D)).astype(np.float32)
    k = rng.normal(size=(B, NKV, S, D)).astype(np.float32)
    v = rng.normal(size=(B, NKV, S, D)).astype(np.float32)
    lengths = np.array([7, 24], np.int32)
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
        attention_kv_int8(jnp.asarray(q), kc, ks, vc, vs, jnp.asarray(mask))
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


def _serve_vs_solo(engine, tok, vision, params, prompts, imgs):
    """int8-KV slot serving must match the engine's float solo decode
    (f32 tiny configs: logit margins dwarf the int8 error)."""
    import asyncio

    from dsocr_tpu.server.scheduler import ContinuousScheduler

    solos = [
        engine.decode(tok, p, [im], vision, params)
        for p, im in zip(prompts, imgs)
    ]

    async def go():
        sched = ContinuousScheduler(engine, tok, n_slots=2, max_len=256)
        return await asyncio.gather(
            *(sched.submit(p, [im], vision, params)
              for p, im in zip(prompts, imgs))
        )

    for got, solo in zip(asyncio.run(go()), solos):
        assert got.generated_tokens == solo.generated_tokens


class _FamTok:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return None


def _img(seed, h=28, w=56):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_dots_slot_serving_int8_kv():
    """GQA family (Qwen2 text stack): int8 slot KV matches solo decode."""
    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.dots import DotsOcrEngine
    from dsocr_tpu.models.dots.config import tiny_dots_config

    eng = DotsOcrEngine(
        tiny_dots_config(), dtype=jnp.float32, max_seq_len=512, kv_quant="int8"
    )
    eng.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
    _serve_vs_solo(
        eng, _FamTok(), VisionSettings(28, 56, False),
        DecodeParameters(max_new_tokens=8, no_repeat_ngram_size=None),
        ["<image>\nA.", "<image>\nB longer."],
        [_img(40), _img(41, 28, 28)],
    )


def test_paddle_slot_serving_int8_kv():
    """M-RoPE family: int8 slot KV matches solo decode (incl. emit_eos)."""
    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.paddleocr import PaddleOcrEngine
    from dsocr_tpu.models.paddleocr.config import tiny_paddle_config

    eng = PaddleOcrEngine(
        tiny_paddle_config(), dtype=jnp.float32, max_seq_len=512,
        kv_quant="int8",
    )
    eng.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
    _serve_vs_solo(
        eng, _FamTok(), VisionSettings(base_size=28, image_size=56, crop_mode=False),
        DecodeParameters(max_new_tokens=8, no_repeat_ngram_size=None),
        ["<image>\nA.", "<image>\nB."],
        [_img(42), _img(43)],
    )


def test_glm_slot_step_int8_kv_logit_parity():
    """GLM (3-axis M-RoPE): int8 slot-step logits track the float cache
    within quantization tolerance. (Exact greedy match is not asserted:
    GLM's tiny random-init config has a 46k vocab whose top-2 margins
    (~0.01) sit inside the int8 error band — on real weights margins are
    orders of magnitude larger.)"""
    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.glm import GlmOcrEngine
    from dsocr_tpu.models.glm.config import tiny_glm_config

    img = _img(44, 40, 60)
    vision = VisionSettings(336, 336, False)
    params = DecodeParameters(max_new_tokens=8, no_repeat_ngram_size=None)

    logits = {}
    for kvq in (None, "int8"):
        eng = GlmOcrEngine(
            tiny_glm_config(), dtype=jnp.float32, max_seq_len=512, kv_quant=kvq
        )
        pre = eng.prefill_for_slot(_FamTok(), "<image>ocr", [img], vision)
        runner = eng.make_slot_runner()
        state = runner.init_state(eng.new_slot_cache(2, 256), context_len=256)
        state, _, first = runner.join(
            state, 0, pre["row_k"], pre["row_v"], pre["prompt_ids"],
            pre["logits"][len(pre["prompt_ids"]) - 1], params, 8,
            pos0=pre.get("pos0"),
        )
        step, _ = eng.slot_step_fn(
            eng.params, jnp.asarray([first, 0], jnp.int32), state.cache, state.pos
        )
        logits[kvq] = np.asarray(step[0], np.float32)

    ref, got = logits[None], logits["int8"]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-2, rel
    assert got.argmax() == ref.argmax()


def test_paged_runner_allocates_int8_pool():
    eng = _tiny_engine("int8")
    runner, cache = eng.make_paged_slot_runner(2, 256)
    import jax.numpy as jnp

    assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8
    assert cache.k_scale is not None and cache.v_scale is not None
    assert cache.k_scale.shape == cache.k.shape[:-1]  # per-token planes
