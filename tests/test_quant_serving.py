"""Quantized serving through the continuous scheduler.

The graded bench serves packed Q8_0 + int8 KV; q4_k halves the decode
step's expert weight streaming again (ref publishes -q4k model variants,
assets/src/lib.rs:101-192) and is the next serving config to measure on
TPU. This test pins the full path — runtime k-quant packing → scheduler
slot serving with the dense all-expert k-quant decode kernels + int8 KV —
on a 256-aligned tiny config (k-quant blocks need in_dim % 256)."""

import asyncio
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.server.scheduler import ContinuousScheduler

VS = VisionSettings(64, 64, False)


class Tok:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


def _kquant_config():
    """tiny config with every decoder contraction dim % 256 so q4_k
    actually engages (ineligible in_dims fall back to q8_0)."""
    base = tiny_deepseek_config()
    lang = dataclasses.replace(
        base.language,
        hidden_size=256,
        intermediate_size=256,
        moe_intermediate_size=256,
        num_attention_heads=4,
        qk_rope_head_dim=None,
    )
    return dataclasses.replace(
        base, language=lang, projector_n_embed=256
    )


@pytest.fixture(scope="module")
def q4_engine():
    return DeepseekOcrEngine(
        _kquant_config(), dtype=jnp.float32, max_seq_len=512,
        quantize="q4_k", kv_quant="int8",
    )


def _serve(engine, prompts, imgs, params, n_slots=2):
    async def go():
        sched = ContinuousScheduler(
            engine, Tok(), n_slots=n_slots, max_len=256, chunk_steps=3
        )
        return await asyncio.gather(
            *(sched.submit(p, [im], VS, params)
              for p, im in zip(prompts, imgs))
        )

    return asyncio.run(go())


def test_q4k_packing_engaged(q4_engine):
    """k-quant planes (not q8 {codes,scales}) must be what's serving:
    the expert stacks and the plain attention projections are 256-wide,
    so nothing should have fallen back."""
    dec = q4_engine.params["decoder"]
    stack = dec["moe_layers"]["experts_down"]
    assert isinstance(stack, dict) and set(stack) != {"codes", "scales"}
    plain = dec["moe_layers"]["qkv_proj"]
    assert isinstance(plain, dict) and set(plain) != {"codes", "scales"}


def test_q4k_paged_serving_matches_contiguous(q4_engine, monkeypatch):
    """Quantized serving over the shared page pool must reproduce the
    contiguous slot runtime (the high-slot TPU config combines paged KV
    with packed quant weights for HBM headroom)."""
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8) for _ in range(3)]
    prompts = [f"<image>pg {i}" for i in range(3)]
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)

    contiguous = _serve(q4_engine, prompts, imgs, params)
    monkeypatch.setenv("DSOCR_PAGED_KV", "1")
    paged = _serve(q4_engine, prompts, imgs, params)
    for a, b in zip(contiguous, paged):
        assert a.generated_tokens == b.generated_tokens


def test_q4k_int8kv_serving(q4_engine):
    """3 pages through 2 slots: the bench's quantized serving shape at
    q4_k. Deterministic across reps (same scheduler config → identical
    greedy tokens), correct lengths, all requests completed."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8) for _ in range(3)]
    prompts = [f"<image>page {i}" for i in range(3)]
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)

    out_a = _serve(q4_engine, prompts, imgs, params)
    out_b = _serve(q4_engine, prompts, imgs, params)
    assert len(out_a) == 3
    for a, b in zip(out_a, out_b):
        assert 1 <= len(a.generated_tokens) <= 4
        assert a.generated_tokens == b.generated_tokens
        assert a.text == b.text


def test_q4k_mixed_down_q8_serving():
    """Regression for the graded-bench geometry: real deepseek has
    moe_intermediate_size % 256 != 0, so the down stack falls back to
    Q8_0 while gate+up pack q4_k (serve_quant.effective_method). The
    decode dispatch must handle the mixed-method group."""
    base = _kquant_config()
    lang = dataclasses.replace(base.language, moe_intermediate_size=160)
    engine = DeepseekOcrEngine(
        dataclasses.replace(base, language=lang),
        dtype=jnp.float32, max_seq_len=512,
        quantize="q4_k", kv_quant="int8",
    )
    dec = engine.params["decoder"]
    down = dec["moe_layers"]["experts_down"]
    assert isinstance(down, dict) and set(down) == {"codes", "scales"}
    gu = dec["moe_layers"].get(
        "experts_gateup", dec["moe_layers"].get("experts_gate")
    )
    assert isinstance(gu, dict) and set(gu) != {"codes", "scales"}

    rng = np.random.default_rng(13)
    imgs = [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8) for _ in range(2)]
    prompts = [f"<image>mix {i}" for i in range(2)]
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    out_a = _serve(engine, prompts, imgs, params)
    out_b = _serve(engine, prompts, imgs, params)
    assert len(out_a) == 2
    for a, b in zip(out_a, out_b):
        assert 1 <= len(a.generated_tokens) <= 4
        assert a.generated_tokens == b.generated_tokens
