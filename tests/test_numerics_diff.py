"""Precision numerics diff (analog of the reference's metal_* suite,
infer-deepseek/tests/metal_f16_f32_logits_diff.rs:76-78): greedy argmax
flips on near-ties, so the check is margin-aware — wherever the f32
model's top-2 logit margin is comfortable, the reduced-precision model
must pick the same token. Runs on random tiny weights (locates precision
machinery, not model quality).

The CPU test runtime cannot execute bf16 x bf16 -> f32 dots (DotThunk
limitation), so on CPU the low-precision model is "bf16-rounded weights
computed in f32" — the weight-quantization half of the bf16 error. The
full-bf16 variant runs when a TPU backend is present."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.models.deepseek.decoder import (
    build_decoder_rope,
    deepseek_forward,
    init_deepseek_params,
    new_cache,
)
from dsocr_tpu.runtime.kv_cache import reset

CFG = tiny_deepseek_config().language
MARGIN = 0.05


def _round_weights_bf16(params):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
        if a.dtype == jnp.float32
        else a,
        params,
    )


def _teacher_force(params, dtype, tokens):
    rope = build_decoder_rope(CFG, 64)
    embeds = jnp.asarray(params["embed_tokens"])[tokens][None].astype(dtype)
    pos = jnp.arange(len(tokens), dtype=jnp.int32)[None]
    cache = reset(new_cache(CFG, 1, 64, dtype))
    logits, _ = deepseek_forward(
        params, CFG, embeds, pos, cache, rope, full_logits=True
    )
    return np.asarray(logits[0], np.float32)  # [S, V]


def _margin_aware_compare(logits_f32, logits_low):
    top2 = np.sort(logits_f32, axis=-1)[:, -2:]
    margins = top2[:, 1] - top2[:, 0]
    confident = margins > MARGIN
    assert confident.any(), "test setup degenerate: every step is a near-tie"
    np.testing.assert_array_equal(
        logits_low.argmax(-1)[confident], logits_f32.argmax(-1)[confident]
    )


def test_bf16_weights_match_f32_outside_near_ties():
    params_f32 = init_deepseek_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    params_low = _round_weights_bf16(params_f32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, 12), jnp.int32)
    _margin_aware_compare(
        _teacher_force(params_f32, jnp.float32, tokens),
        _teacher_force(params_low, jnp.float32, tokens),
    )


def test_logit_drift_bounded():
    """Per-step drift diagnostic (ref metal_f16_f32_cache_layer_diff):
    bf16-rounded weights must keep logits within bf16-scale relative
    error of the f32 run."""
    params_f32 = init_deepseek_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    params_low = _round_weights_bf16(params_f32)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, 8), jnp.int32)
    lf = _teacher_force(params_f32, jnp.float32, tokens)
    lb = _teacher_force(params_low, jnp.float32, tokens)
    denom = np.abs(lf).max() + 1e-6
    rel = np.abs(lb - lf).max() / denom
    assert rel < 0.15, f"bf16-rounded logits drifted {rel:.3f} (relative) from f32"


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="full-bf16 dots need a TPU backend"
)
def test_full_bf16_matches_f32_outside_near_ties():
    params_f32 = init_deepseek_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params_f32,
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, 12), jnp.int32)
    _margin_aware_compare(
        _teacher_force(params_f32, jnp.float32, tokens),
        _teacher_force(params_bf16, jnp.bfloat16, tokens),
    )
