"""Generic decode loop semantics vs a host-side reference simulation
(contract: infer-deepseek/src/model/mod.rs:1870-2048)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core.sampling import select_token_id_host
from dsocr_tpu.runtime import GenerateParams, Generator
from dsocr_tpu.runtime.kv_cache import (
    bump_length,
    init_kv_cache,
    layer_kv,
    reset,
    write_kv,
)

V = 12  # tiny vocab


def _mock_step(transition):
    """step_fn: logits = transition[current_token]; no cache."""

    def step(params, token_ids, cache, pos_state):
        logits = transition[token_ids]
        return logits, cache, pos_state

    return step


@dataclasses.dataclass
class _HostParams:
    do_sample: bool = False
    temperature: float = 0.0
    top_p: float = None
    top_k: int = None
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = None


def _host_generate(transition, prompt, gp: GenerateParams, first_logits):
    """Reference-faithful host simulation of the generate loop."""
    hp = _HostParams(
        do_sample=gp.do_sample,
        temperature=gp.temperature,
        top_p=gp.top_p,
        top_k=gp.top_k,
        repetition_penalty=gp.repetition_penalty,
        no_repeat_ngram_size=gp.no_repeat_ngram_size,
    )
    context = list(prompt)
    current = select_token_id_host(first_logits, hp, context)
    if current in gp.eos_ids:
        return []
    generated = []
    for step in range(gp.max_new_tokens):
        context.append(current)
        generated.append(current)
        if step + 1 == gp.max_new_tokens:
            break
        logits = transition[current]
        current = select_token_id_host(logits, hp, context)
        if current in gp.eos_ids:
            break
    return generated


def _run_both(transition_np, prompt, gp, first_logits_np):
    transition = jnp.asarray(transition_np)
    gen = Generator(_mock_step(transition), gp)
    result = gen.generate(
        transition,
        jnp.asarray(first_logits_np[None, :]),
        cache=None,
        pos_state=None,
        prompt_tokens=[prompt],
        rng=jax.random.PRNGKey(0),
    )
    host = _host_generate(transition_np, prompt, gp, first_logits_np)
    return result, host


def _chain_transition():
    """Deterministic chain: token t → t+1 (mod V)."""
    t = np.full((V, V), -10.0, dtype=np.float32)
    for i in range(V):
        t[i, (i + 1) % V] = 10.0
    return t


def test_greedy_chain_matches_host():
    t = _chain_transition()
    first = t[3]  # prompt "ends" at 3 → first generated is 4
    gp = GenerateParams(max_new_tokens=5, chunk_size=2)
    result, host = _run_both(t, [1, 2, 3], gp, first)
    assert result.tokens[0] == host == [4, 5, 6, 7, 8]
    assert result.steps == 5


def test_eos_stops_and_not_emitted():
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=10, eos_ids=(7,), chunk_size=4)
    result, host = _run_both(t, [1, 2, 3], gp, t[3])
    assert result.tokens[0] == host == [4, 5, 6]


def test_eos_on_prefill_token_empty():
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=10, eos_ids=(4,))
    result, host = _run_both(t, [1, 2, 3], gp, t[3])
    assert result.tokens[0] == host == []
    assert result.steps == 0


def test_max_new_tokens_budget():
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=2, chunk_size=16)
    result, host = _run_both(t, [0], gp, t[0])
    assert result.tokens[0] == host
    assert len(result.tokens[0]) == 2


def test_repetition_penalty_affects_loop():
    # Transition prefers staying on the same token; penalty forces moves.
    t = np.full((V, V), 0.0, dtype=np.float32)
    for i in range(V):
        t[i, i] = 2.0
        t[i, (i + 1) % V] = 1.9
    gp = GenerateParams(max_new_tokens=4, repetition_penalty=1.5, chunk_size=2)
    result, host = _run_both(t, [5], gp, t[5])
    assert result.tokens[0] == host


def test_ngram_ban_in_loop():
    # Cycle generator that would repeat [2,3] forever; 2-gram ban breaks it.
    t = np.full((V, V), -5.0, dtype=np.float32)
    t[2, 3] = 5.0
    t[3, 2] = 5.0
    t[3, 4] = 4.0
    t[2, 5] = 4.0
    t[4, 2] = 5.0
    t[5, 2] = 5.0
    gp = GenerateParams(max_new_tokens=6, no_repeat_ngram_size=2, chunk_size=3)
    result, host = _run_both(t, [2], gp, t[2])
    assert result.tokens[0] == host


@pytest.mark.parametrize("chunk", [1, 3, 64])
def test_chunk_size_invariance(chunk):
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=7, chunk_size=chunk)
    result, host = _run_both(t, [1], gp, t[1])
    assert result.tokens[0] == host


def test_streaming_callback_progression():
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=6, chunk_size=2)
    seen = []
    gen = Generator(_mock_step(jnp.asarray(t)), gp)
    gen.generate(
        jnp.asarray(t),
        jnp.asarray(t[0][None, :]),
        cache=None,
        pos_state=None,
        prompt_tokens=[[0]],
        stream_callback=lambda steps, toks: seen.append(list(toks)),
    )
    assert seen[-1] == [1, 2, 3, 4, 5, 6]
    # prefixes must be consistent
    for a, b in zip(seen, seen[1:]):
        assert b[: len(a)] == a


def test_batched_rows_independent_eos():
    t = _chain_transition()
    gp = GenerateParams(max_new_tokens=6, eos_ids=(8,), chunk_size=2)
    gen = Generator(_mock_step(jnp.asarray(t)), gp)
    # row 0 starts at 5 → hits 8 quickly; row 1 starts at 0 → runs longer
    first = np.stack([t[5], t[0]])
    result = gen.generate(
        jnp.asarray(t),
        jnp.asarray(first),
        cache=None,
        pos_state=None,
        prompt_tokens=[[5], [0]],
    )
    assert result.tokens[0] == [6, 7]  # 8 is EOS, not emitted
    assert result.tokens[1] == [1, 2, 3, 4, 5, 6]


# -- KV cache unit behavior ----------------------------------------------------


def test_kv_cache_write_and_bump():
    cache = init_kv_cache(2, 1, 2, 8, 4, 4, dtype=jnp.float32)
    k = jnp.ones((1, 2, 3, 4))
    v = jnp.full((1, 2, 3, 4), 2.0)
    cache = write_kv(cache, 0, k, v, jnp.int32(0))
    cache = write_kv(cache, 1, k, v, jnp.int32(0))
    cache = bump_length(cache, 3)
    assert int(cache.length) == 3
    k0, v0 = layer_kv(cache, 0)
    np.testing.assert_allclose(np.asarray(k0[:, :, :3]), 1.0)
    np.testing.assert_allclose(np.asarray(v0[:, :, 3:]), 0.0)  # untouched


def test_kv_cache_decode_append_position():
    cache = init_kv_cache(1, 1, 1, 8, 2, 2, dtype=jnp.float32)
    cache = bump_length(write_kv(cache, 0, jnp.ones((1, 1, 4, 2)), jnp.ones((1, 1, 4, 2)), jnp.int32(0)), 4)
    step_k = jnp.full((1, 1, 1, 2), 7.0)
    cache = bump_length(write_kv(cache, 0, step_k, step_k, cache.length), 1)
    k0, _ = layer_kv(cache, 0)
    np.testing.assert_allclose(np.asarray(k0[0, 0, 4]), 7.0)
    assert int(cache.length) == 5


def test_kv_cache_reset_semantics():
    cache = init_kv_cache(1, 1, 1, 4, 2, 2)
    cache = bump_length(cache, 4)
    cache = reset(cache)
    assert int(cache.length) == 0


def test_clamp_new_tokens_passthrough_and_clamp():
    from dsocr_tpu.runtime import clamp_new_tokens

    assert clamp_new_tokens(128, 512, 8192) == 512
    assert clamp_new_tokens(8000, 512, 8192) == 192
    with pytest.raises(ValueError):
        clamp_new_tokens(8192, 512, 8192)
