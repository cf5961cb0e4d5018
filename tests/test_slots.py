"""Continuous-batching slot runtime: per-row KV regions, mid-flight
joins, per-row dynamic sampling params, slot release/reuse.

The correctness bar (VERDICT round-1 item 3): a request that joins while
another is mid-decode must produce exactly its solo-decode tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.core.sampling import (
    SlotSamplingParams,
    banned_ngram_mask_device,
    banned_ngram_mask_slots,
    select_token_id_device,
    select_token_id_slots,
)
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config

SETTINGS = VisionSettings(64, 64, False)


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


@pytest.fixture(scope="module")
def engine():
    return DeepseekOcrEngine(
        tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024
    )


@pytest.fixture(scope="module")
def runner(engine):
    return engine.make_slot_runner()


def _join_request(engine, runner, state, row, prompt, image, params, max_new):
    pre = engine.prefill_for_slot(FakeTokenizer(), prompt, [image], SETTINGS)
    state, finished, first = runner.join(
        state,
        row,
        pre["row_k"],
        pre["row_v"],
        pre["prompt_ids"],
        pre["logits"],
        params,
        max_new,
        pos0=pre["pos0"],
    )
    return state, finished


def _drain(engine, runner, state, rows, chunk=4):
    """Run chunks until the given rows are inactive; return per-row tokens."""
    for _ in range(100):
        state = runner.run_chunk(engine.params, state, chunk)
        h = runner.harvest(state)
        if not any(h.active[r] for r in rows):
            break
    h = runner.harvest(state)
    return state, {r: h.generated(r) for r in rows}, h


def test_join_mid_decode_matches_solo(engine, runner):
    """Request B joins while request A is mid-decode; both equal solo."""
    rng = np.random.default_rng(42)
    img_a = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (90, 50, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=10, no_repeat_ngram_size=None)
    tok = FakeTokenizer()

    solo_a = engine.decode(tok, "<image>short", [img_a], SETTINGS, params)
    solo_b = engine.decode(
        tok, "<image>a much longer prompt here", [img_b], SETTINGS, params
    )

    cache = engine.new_slot_cache(n_slots=4, max_len=512)
    state = runner.init_state(cache, context_len=512)

    state, fin_a = _join_request(
        engine, runner, state, 0, "<image>short", img_a, params, 10
    )
    assert not fin_a
    # A decodes a few tokens alone
    state = runner.run_chunk(engine.params, state, 3)
    h = runner.harvest(state)
    assert h.active[0] and len(h.generated(0)) >= 1

    # B joins mid-flight
    state, fin_b = _join_request(
        engine, runner, state, 1, "<image>a much longer prompt here",
        img_b, params, 10,
    )
    assert not fin_b
    state, toks, _ = _drain(engine, runner, state, [0, 1])
    assert toks[0] == solo_a.generated_tokens
    assert toks[1] == solo_b.generated_tokens


def test_slot_release_and_reuse(engine, runner):
    """A freed slot re-prefills cleanly; stale KV/context cannot leak."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None)
    solo = engine.decode(FakeTokenizer(), "<image>abc", [img], SETTINGS, params)

    cache = engine.new_slot_cache(n_slots=2, max_len=512)
    state = runner.init_state(cache, context_len=512)

    # occupy slot 0 with a different request, finish it, release
    img2 = rng.integers(0, 256, (40, 70, 3), dtype=np.uint8)
    state, _ = _join_request(
        engine, runner, state, 0, "<image>zzz other", img2, params, 6
    )
    state, _, _ = _drain(engine, runner, state, [0])
    state = runner.release(state, 0)
    h = runner.harvest(state)
    assert not h.active[0] and h.ctx_len[0] == 0

    # reuse slot 0 for the reference request
    state, _ = _join_request(engine, runner, state, 0, "<image>abc", img, params, 6)
    state, toks, _ = _drain(engine, runner, state, [0])
    assert toks[0] == solo.generated_tokens


def test_mixed_params_rows(engine, runner):
    """Rows with different per-request params decode in one batch:
    different max_new_tokens and repetition penalties."""
    rng = np.random.default_rng(9)
    img_a = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (55, 45, 3), dtype=np.uint8)
    tok = FakeTokenizer()
    pa = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    pb = DecodeParameters(
        max_new_tokens=9, repetition_penalty=1.8, no_repeat_ngram_size=3
    )
    solo_a = engine.decode(tok, "<image>one", [img_a], SETTINGS, pa)
    solo_b = engine.decode(tok, "<image>two two", [img_b], SETTINGS, pb)

    cache = engine.new_slot_cache(n_slots=2, max_len=512)
    state = runner.init_state(cache, context_len=512)
    state, _ = _join_request(engine, runner, state, 0, "<image>one", img_a, pa, 4)
    state, _ = _join_request(engine, runner, state, 1, "<image>two two", img_b, pb, 9)
    state, toks, _ = _drain(engine, runner, state, [0, 1])
    assert toks[0] == solo_a.generated_tokens
    assert toks[1] == solo_b.generated_tokens


def test_finished_row_freezes_while_other_decodes(engine, runner):
    """A short row hitting its budget freezes (ctx stops growing) while a
    long row keeps decoding."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
    params_short = DecodeParameters(max_new_tokens=2, no_repeat_ngram_size=None)
    params_long = DecodeParameters(max_new_tokens=12, no_repeat_ngram_size=None)

    cache = engine.new_slot_cache(n_slots=2, max_len=512)
    state = runner.init_state(cache, context_len=512)
    state, _ = _join_request(engine, runner, state, 0, "<image>s", img, params_short, 2)
    state, _ = _join_request(engine, runner, state, 1, "<image>l", img, params_long, 12)
    state = runner.run_chunk(engine.params, state, 5)
    h = runner.harvest(state)
    assert not h.active[0] and len(h.generated(0)) == 2
    assert h.active[1] and len(h.generated(1)) == 5
    state, toks, _ = _drain(engine, runner, state, [1])
    assert len(toks[1]) == 12


# -- per-row sampling unit checks ----------------------------------------------


def test_slot_sampler_matches_device_per_row():
    """Greedy slot selection with heterogeneous per-row knobs must match
    per-row select_token_id_device calls."""
    rng = np.random.default_rng(123)
    B, V, L = 3, 24, 16
    logits = rng.normal(size=(B, V)).astype(np.float32)
    ctx = rng.integers(0, V, size=(B, L)).astype(np.int32)
    ctx_len = np.array([10, 14, 7], np.int32)
    row_params = [
        dict(repetition_penalty=1.0, no_repeat_ngram_size=None),
        dict(repetition_penalty=1.6, no_repeat_ngram_size=3),
        dict(repetition_penalty=0.7, no_repeat_ngram_size=2),
    ]
    sampling = SlotSamplingParams(
        temperature=jnp.zeros((B,), jnp.float32),
        top_p=jnp.ones((B,), jnp.float32),
        top_k=jnp.zeros((B,), jnp.int32),
        repetition_penalty=jnp.asarray([1.0, 1.6, 0.7], jnp.float32),
        do_sample=jnp.zeros((B,), jnp.bool_),
        ngram=jnp.asarray([0, 3, 2], jnp.int32),
    )
    got = np.asarray(
        select_token_id_slots(
            jnp.asarray(logits), jnp.asarray(ctx), jnp.asarray(ctx_len),
            sampling, ngram_max=8, rng_key=jax.random.PRNGKey(0),
        )
    )
    for r, kw in enumerate(row_params):
        want = select_token_id_device(
            jnp.asarray(logits[r : r + 1]),
            jnp.asarray(ctx[r : r + 1]),
            jnp.asarray(ctx_len[r : r + 1]),
            do_sample=False, temperature=0.0, top_p=None, top_k=None,
            **kw,
        )
        assert got[r] == int(want[0]), f"row {r}"


@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_slot_ngram_mask_matches_static(n):
    """Per-row dynamic ngram mask equals the static-n device mask."""
    rng = np.random.default_rng(n)
    B, V, L = 2, 12, 24
    ctx = rng.integers(0, 5, size=(B, L)).astype(np.int32)  # few symbols → repeats
    ctx_len = np.array([20, 13], np.int32)
    static = np.asarray(
        banned_ngram_mask_device(jnp.asarray(ctx), jnp.asarray(ctx_len), n, V)
    )
    dyn = np.asarray(
        banned_ngram_mask_slots(
            jnp.asarray(ctx), jnp.asarray(ctx_len),
            jnp.full((B,), n, jnp.int32), ngram_max=9, vocab_size=V,
        )
    )
    np.testing.assert_array_equal(dyn, static)


def test_select_first_tokens_matches_host(engine, runner):
    """Wave-level device first-token selection (one [B]-int pull instead
    of a [V]-f32 host pull per row) must match join's host path exactly
    for deterministic specs (greedy, ngram ban, repetition penalty)."""
    from dsocr_tpu.core.sampling import select_token_id_host

    rng = np.random.default_rng(17)
    V = 128
    packets = []
    for i in range(3):
        n = int(rng.integers(4, 40))
        # few symbols → ngram/penalty paths actually engage
        ids = rng.integers(0, 6, size=n).tolist()
        packets.append(
            {
                "prompt_ids": ids,
                "logits": jnp.asarray(
                    rng.normal(size=V).astype(np.float32)
                ),
            }
        )
    specs = [
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=3),
        DecodeParameters(
            max_new_tokens=4, no_repeat_ngram_size=None,
            repetition_penalty=1.7,
        ),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=2,
                         repetition_penalty=1.3),
    ]
    got = runner.select_first_tokens(packets, specs, pad_to=4)
    for p, spec, tok in zip(packets, specs, got):
        want = select_token_id_host(
            np.asarray(p["logits"], np.float32), spec, p["prompt_ids"],
            np.random.default_rng(0),
        )
        assert tok == want


def test_scheduler_uses_device_first_tokens(engine):
    """The continuous scheduler's serving output must be unchanged by the
    wave-level selection (it rides job.first into join), and the firsts
    must actually be set."""
    import asyncio

    from dsocr_tpu.server.scheduler import ContinuousScheduler

    rng = np.random.default_rng(23)
    imgs = [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8) for _ in range(3)]
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)

    seen_firsts = []

    class Probe(ContinuousScheduler):
        def _join_ready(self, row, job, pre):
            seen_firsts.append(job.first)
            return super()._join_ready(row, job, pre)

    async def go(cls):
        sched = cls(engine, FakeTokenizer(), n_slots=2, max_len=256,
                    chunk_steps=3)
        return await asyncio.gather(
            *(sched.submit(f"<image>p{i}", [im], SETTINGS, params)
              for i, im in enumerate(imgs))
        )

    probed = asyncio.run(go(Probe))
    assert all(f is not None for f in seen_firsts)

    # host-fallback comparison: force firsts off and compare outputs
    class NoWave(ContinuousScheduler):
        def _prepare_jobs(self, jobs):
            packets = super()._prepare_jobs(jobs)
            for job in jobs:
                job.first = None
            return packets

    plain = asyncio.run(go(NoWave))
    for a, b in zip(probed, plain):
        assert a.generated_tokens == b.generated_tokens
