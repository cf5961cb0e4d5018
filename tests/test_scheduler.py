"""Micro-batching scheduler: coalescing, param grouping, fallback,
error propagation."""

import asyncio

import pytest

from dsocr_tpu.core import DecodeOutcome, DecodeParameters, VisionSettings
from dsocr_tpu.server.scheduler import BatchScheduler


class BatchEngine:
    def __init__(self, delay=0.0):
        self.batch_calls = []
        self.single_calls = 0
        self.delay = delay

    def decode_batch(self, tokenizer, prompts, images, vision, params):
        import time

        if self.delay:
            time.sleep(self.delay)
        self.batch_calls.append(len(prompts))
        return [
            DecodeOutcome(text=f"out:{p}", prompt_tokens=1, response_tokens=1,
                          generated_tokens=[1])
            for p in prompts
        ]

    def decode(self, tokenizer, prompt, images, vision, params, stream=None):
        self.single_calls += 1
        return DecodeOutcome(text=f"single:{prompt}", prompt_tokens=1,
                             response_tokens=1, generated_tokens=[1])


VS = VisionSettings(64, 64, False)


def test_concurrent_requests_batch():
    engine = BatchEngine()
    params = DecodeParameters(max_new_tokens=4)

    async def go():
        sched = BatchScheduler(engine, tokenizer=None, window_ms=50)
        results = await asyncio.gather(
            *(sched.submit(f"p{i}", [], VS, params) for i in range(5))
        )
        return results, sched

    results, sched = asyncio.run(go())
    assert [r.text for r in results] == [f"out:p{i}" for i in range(5)]
    assert engine.batch_calls == [5]
    assert engine.single_calls == 0


def test_different_params_grouped_separately():
    engine = BatchEngine()

    async def go():
        sched = BatchScheduler(engine, tokenizer=None, window_ms=50)
        a = sched.submit("a", [], VS, DecodeParameters(max_new_tokens=4))
        b = sched.submit("b", [], VS, DecodeParameters(max_new_tokens=8))
        c = sched.submit("c", [], VS, DecodeParameters(max_new_tokens=4))
        return await asyncio.gather(a, b, c)

    results = asyncio.run(go())
    assert {r.text for r in results} == {"out:a", "single:b", "out:c"}
    # group of 2 batched; singleton went through decode()
    assert engine.batch_calls == [2]
    assert engine.single_calls == 1


def test_engine_without_batch_path_falls_back():
    class SingleEngine:
        def __init__(self):
            self.calls = 0

        def decode(self, tokenizer, prompt, images, vision, params, stream=None):
            self.calls += 1
            return DecodeOutcome(text=prompt, prompt_tokens=1, response_tokens=1,
                                 generated_tokens=[1])

    engine = SingleEngine()

    async def go():
        sched = BatchScheduler(engine, tokenizer=None, window_ms=30)
        return await asyncio.gather(
            *(sched.submit(f"p{i}", [], VS, DecodeParameters()) for i in range(3))
        )

    results = asyncio.run(go())
    assert len(results) == 3
    assert engine.calls == 3


def test_sequential_requests_respawn_worker():
    engine = BatchEngine()

    async def go():
        sched = BatchScheduler(engine, tokenizer=None, window_ms=5)
        r1 = await sched.submit("x", [], VS, DecodeParameters())
        r2 = await sched.submit("y", [], VS, DecodeParameters())
        return r1, r2

    r1, r2 = asyncio.run(go())
    assert engine.single_calls == 2  # singletons take the single path


def test_error_propagates_to_all_futures():
    class FailingEngine:
        def decode_batch(self, *a, **k):
            raise RuntimeError("boom")

        def decode(self, *a, **k):
            raise RuntimeError("boom-single")

    async def go():
        sched = BatchScheduler(FailingEngine(), tokenizer=None, window_ms=30)
        tasks = [
            sched.submit(f"p{i}", [], VS, DecodeParameters()) for i in range(2)
        ]
        return await asyncio.gather(*tasks, return_exceptions=True)

    results = asyncio.run(go())
    assert all(isinstance(r, RuntimeError) for r in results)


# -- continuous (slot-based) scheduler -----------------------------------------


import jax.numpy as jnp
import numpy as np

from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.server.scheduler import ContinuousScheduler


class SlotTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


@pytest.fixture(scope="module")
def slot_engine():
    return DeepseekOcrEngine(
        tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024
    )


def _img(seed, h=50, w=50):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_continuous_concurrent_mixed_params(slot_engine):
    """Concurrent requests with DIFFERENT params decode together and match
    their solo runs (the round-1 scheduler required identical params)."""
    tok = SlotTokenizer()
    pa = DecodeParameters(max_new_tokens=5, no_repeat_ngram_size=None)
    pb = DecodeParameters(max_new_tokens=8, repetition_penalty=1.5,
                          no_repeat_ngram_size=3)
    img_a, img_b = _img(1), _img(2, 60, 40)
    solo_a = slot_engine.decode(tok, "<image>aa", [img_a], VS, pa)
    solo_b = slot_engine.decode(tok, "<image>bbb", [img_b], VS, pb)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=3)
        return await asyncio.gather(
            sched.submit("<image>aa", [img_a], VS, pa),
            sched.submit("<image>bbb", [img_b], VS, pb),
        ), sched

    (ra, rb), sched = asyncio.run(go())
    assert ra.generated_tokens == solo_a.generated_tokens
    assert rb.generated_tokens == solo_b.generated_tokens
    assert max(sched.batch_sizes, default=0) == 2  # they really shared chunks


def test_continuous_join_mid_flight(slot_engine):
    """Request B arrives while A is mid-decode; both equal their solo runs."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=12, no_repeat_ngram_size=None)
    img_a, img_b = _img(3), _img(4)
    solo_a = slot_engine.decode(tok, "<image>first", [img_a], VS, params)
    solo_b = slot_engine.decode(tok, "<image>second req", [img_b], VS, params)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2)
        task_a = asyncio.create_task(
            sched.submit("<image>first", [img_a], VS, params)
        )
        # let A prefill and decode at least one chunk before B arrives
        while not sched.batch_sizes:
            await asyncio.sleep(0.01)
        task_b = asyncio.create_task(
            sched.submit("<image>second req", [img_b], VS, params)
        )
        return await asyncio.gather(task_a, task_b), sched

    (ra, rb), sched = asyncio.run(go())
    assert ra.generated_tokens == solo_a.generated_tokens
    assert rb.generated_tokens == solo_b.generated_tokens
    assert 2 in sched.batch_sizes  # B really joined while A was active


def test_continuous_streaming_participates(slot_engine):
    """A streaming request joins the slot loop and receives monotonically
    growing token prefixes; final text matches the solo run."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=10, no_repeat_ngram_size=None)
    img = _img(5)
    solo = slot_engine.decode(tok, "<image>stream", [img], VS, params)
    seen = []

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    stream_chunk_steps=2, chunk_steps=2)
        return await sched.submit(
            "<image>stream", [img], VS, params,
            stream_cb=lambda step, toks: seen.append(list(toks)),
        )

    outcome = asyncio.run(go())
    assert outcome.generated_tokens == solo.generated_tokens
    assert len(seen) >= 2  # multiple chunk-boundary callbacks
    for prev, cur in zip(seen, seen[1:]):
        assert cur[: len(prev)] == prev  # prefix-monotone
    assert seen[-1] == solo.generated_tokens


def test_continuous_more_requests_than_slots(slot_engine):
    """Requests beyond slot capacity queue and complete as slots free."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    imgs = [_img(10 + i) for i in range(4)]
    solos = [
        slot_engine.decode(tok, f"<image>req{i}", [imgs[i]], VS, params)
        for i in range(4)
    ]

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2)
        return await asyncio.gather(
            *(sched.submit(f"<image>req{i}", [imgs[i]], VS, params)
              for i in range(4))
        )

    results = asyncio.run(go())
    for got, solo in zip(results, solos):
        assert got.generated_tokens == solo.generated_tokens


def test_continuous_prefill_error_frees_slot(slot_engine):
    """A failing request (bad image) rejects its future and does not leak
    its slot; the next request still runs."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    img = _img(20)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                    chunk_steps=2)
        bad = sched.submit("<image><image>two slots one img", [img], VS, params)
        with pytest.raises(ValueError):
            await bad
        return await sched.submit("<image>ok", [img], VS, params)

    outcome = asyncio.run(go())
    assert outcome.response_tokens > 0


def test_continuous_survives_repeated_asyncio_run(slot_engine):
    """One scheduler driven by SEVERAL asyncio.run loops (the bench and
    any embed-in-script usage): asyncio queues bind to the loop on their
    first blocking put — enough requests to fill the bounded ready queue
    must not poison the next loop ('bound to a different event loop')."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    imgs = [_img(40 + i) for i in range(5)]
    solos = [
        slot_engine.decode(tok, f"<image>loop{i}", [imgs[i]], VS, params)
        for i in range(5)
    ]
    sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                chunk_steps=2)

    async def go(n):
        return await asyncio.gather(
            *(sched.submit(f"<image>loop{i}", [imgs[i]], VS, params)
              for i in range(n))
        )

    # 5 requests through 1 slot forces ready-queue blocking (binds loop 1)
    first = asyncio.run(go(5))
    second = asyncio.run(go(3))  # fresh loop reuses the same scheduler
    for got, solo in zip(first, solos):
        assert got.generated_tokens == solo.generated_tokens
    for got, solo in zip(second, solos[:3]):
        assert got.generated_tokens == solo.generated_tokens


def test_continuous_rejects_oversize_ngram(slot_engine):
    """no_repeat_ngram_size beyond the slot runtime's static window is
    rejected with a clean error instead of silently over-banning
    (ADVICE r2: core/sampling.py banned_ngram_mask_slots truncation)."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=99)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                    chunk_steps=2)
        return await asyncio.gather(
            sched.submit("<image>x", [_img(9)], VS, params),
            return_exceptions=True,
        )

    (res,) = asyncio.run(go())
    assert isinstance(res, ValueError)
    assert "no_repeat_ngram_size" in str(res)


def test_continuous_max_len_rounds_down_to_128():
    """Non-128-multiple capacities are aligned down so near-capacity
    prompts are clamped instead of crashing the KV insert (ADVICE r2)."""

    class NoSlotEngine:
        pass

    sched = ContinuousScheduler.__new__(ContinuousScheduler)
    ContinuousScheduler.__init__(
        sched, engine=NoSlotEngine(), tokenizer=None, n_slots=1, max_len=1000
    )
    assert sched.max_len == 896


def test_continuous_recovers_from_donated_state(slot_engine):
    """A loop that dies with a donating jit (chunk/join) still in flight
    leaves the scheduler's slot state referencing deleted buffers; the
    next loop's first submit must detect that and rebuild the state
    instead of crashing (root cause of the repeated-asyncio.run flake)."""
    import jax

    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    img = _img(50)
    sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                chunk_steps=2)

    async def one():
        return await sched.submit("<image>gen", [img], VS, params)

    first = asyncio.run(one())
    # simulate the dropped donating-jit result: delete the state buffers
    for leaf in jax.tree_util.tree_leaves(sched._state):
        if hasattr(leaf, "delete"):
            leaf.delete()
    second = asyncio.run(one())
    assert second.generated_tokens == first.generated_tokens


# -- prefix (prefill-packet) cache ---------------------------------------------


class CountingEngine:
    """Delegating wrapper that counts prefill work (per-request rows)."""

    def __init__(self, engine):
        self._engine = engine
        self.rows_prefilled = 0

    def __getattr__(self, name):
        return getattr(self._engine, name)

    def prefill_for_slot(self, tokenizer, prompt, images, vision):
        self.rows_prefilled += 1
        return self._engine.prefill_for_slot(tokenizer, prompt, images, vision)

    def prefill_for_slots(self, tokenizer, requests):
        self.rows_prefilled += len(requests)
        return self._engine.prefill_for_slots(tokenizer, requests)


def test_prefix_cache_reuses_identical_requests(slot_engine):
    """Byte-identical (prompt, images, vision) requests prefill ONCE:
    wave-local duplicates alias the first packet, later waves and later
    event loops hit the LRU — and every output matches the solo run."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None)
    img = _img(60)
    solo = slot_engine.decode(tok, "<image>same", [img], VS, params)
    engine = CountingEngine(slot_engine)
    sched = ContinuousScheduler(engine, tok, n_slots=2, max_len=256,
                                chunk_steps=3, prefix_cache=4)

    async def burst(n):
        return await asyncio.gather(
            *(sched.submit("<image>same", [img], VS, params) for _ in range(n))
        )

    outs = asyncio.run(burst(4))
    assert all(o.generated_tokens == solo.generated_tokens for o in outs)
    assert engine.rows_prefilled == 1
    assert sched.prefix_cache.hits + sched.prefix_cache.misses >= 1

    # a fresh event loop reuses the cached packet too (device arrays are
    # loop-independent)
    outs2 = asyncio.run(burst(2))
    assert all(o.generated_tokens == solo.generated_tokens for o in outs2)
    assert engine.rows_prefilled == 1
    assert sched.prefix_cache.hits >= 2


def test_prefix_cache_distinct_requests_miss(slot_engine):
    """Different image bytes (or prompt) must not collide."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=5, no_repeat_ngram_size=None)
    img_a, img_b = _img(61), _img(62)
    solo_a = slot_engine.decode(tok, "<image>x", [img_a], VS, params)
    solo_b = slot_engine.decode(tok, "<image>x", [img_b], VS, params)
    engine = CountingEngine(slot_engine)
    sched = ContinuousScheduler(engine, tok, n_slots=2, max_len=256,
                                chunk_steps=3, prefix_cache=4)

    async def go():
        return await asyncio.gather(
            sched.submit("<image>x", [img_a], VS, params),
            sched.submit("<image>x", [img_b], VS, params),
        )

    ra, rb = asyncio.run(go())
    assert ra.generated_tokens == solo_a.generated_tokens
    assert rb.generated_tokens == solo_b.generated_tokens
    assert engine.rows_prefilled == 2


def test_prefix_cache_per_request_params(slot_engine):
    """A cached packet is parameter-independent: the same packet serves
    requests with different max_new/sampling (applied at join time)."""
    tok = SlotTokenizer()
    img = _img(63)
    p_short = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    p_long = DecodeParameters(max_new_tokens=9, no_repeat_ngram_size=None)
    solo_short = slot_engine.decode(tok, "<image>p", [img], VS, p_short)
    solo_long = slot_engine.decode(tok, "<image>p", [img], VS, p_long)
    engine = CountingEngine(slot_engine)
    sched = ContinuousScheduler(engine, tok, n_slots=2, max_len=256,
                                chunk_steps=3, prefix_cache=2)

    async def go():
        return await asyncio.gather(
            sched.submit("<image>p", [img], VS, p_short),
            sched.submit("<image>p", [img], VS, p_long),
        )

    rs, rl = asyncio.run(go())
    assert rs.generated_tokens == solo_short.generated_tokens
    assert rl.generated_tokens == solo_long.generated_tokens
    assert engine.rows_prefilled == 1


def test_prefix_cache_lru_and_keys():
    from dsocr_tpu.server.prefix_cache import PrefixCache, request_key

    img = _img(64)
    k1 = request_key("a", [img], VS)
    assert k1 == request_key("a", [img.copy()], VS)
    assert k1 != request_key("b", [img], VS)
    assert k1 != request_key("a", [_img(65)], VS)
    assert k1 != request_key("a", [img], VisionSettings(32, 32, False))
    assert k1 != request_key("a", [img, img], VS)

    cache = PrefixCache(2)
    cache.put("k1", {"v": 1})
    cache.put("k2", {"v": 2})
    assert cache.get("k1") == {"v": 1}  # refreshes k1
    cache.put("k3", {"v": 3})  # evicts k2 (LRU)
    assert cache.get("k2") is None
    assert cache.get("k1") == {"v": 1}
    assert cache.get("k3") == {"v": 3}
    assert len(cache) == 2
    assert cache.hits == 3 and cache.misses == 1


def test_prefix_cache_bad_image_fails_only_its_job(slot_engine):
    """An image that raises while being digested (truncated file etc.)
    must fail its own request, not strand the whole wave's futures."""

    class ExplodingImage:
        def __array__(self, *a, **k):
            raise OSError("truncated image")

    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    good = _img(80)
    sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                chunk_steps=3, prefix_cache=4)

    async def go():
        return await asyncio.gather(
            sched.submit("<image>good", [good], VS, params),
            sched.submit("<image>bad", [ExplodingImage()], VS, params),
            return_exceptions=True,
        )

    ok, bad = asyncio.run(go())
    assert not isinstance(ok, Exception) and ok.response_tokens == 4
    assert isinstance(bad, Exception)


def test_prefix_cache_alias_counts_as_hit(slot_engine):
    """Wave-local duplicates are served by aliasing one prefill — the
    /metrics counters must reflect that as hits, not misses."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    img = _img(81)
    sched = ContinuousScheduler(CountingEngine(slot_engine), tok, n_slots=2,
                                max_len=256, chunk_steps=3, prefix_cache=4)

    async def go():
        return await asyncio.gather(
            *(sched.submit("<image>dup", [img], VS, params) for _ in range(4))
        )

    asyncio.run(go())
    assert sched.prefix_cache.misses == 1
    assert sched.prefix_cache.hits == 3


def test_speculative_chunk_dispatch_matches_serial(slot_engine, monkeypatch):
    """With long budgets and no streaming, the worker dispatches chunk
    N+1 before harvesting chunk N; tokens must match the serial run."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=16, no_repeat_ngram_size=None)
    imgs = [_img(90), _img(91)]
    prompts = ["<image>sp1", "<image>sp2"]

    def run(flag):
        monkeypatch.setenv("DSOCR_PIPELINE_CHUNKS", flag)
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=4)

        async def go():
            return await asyncio.gather(*(
                sched.submit(p, [im], VS, params)
                for p, im in zip(prompts, imgs)
            ))

        return asyncio.run(go()), sched

    serial, s0 = run("0")
    piped, s1 = run("1")
    assert s0.speculated_chunks == 0
    assert s1.speculated_chunks > 0  # 16 tokens / chunk 4 leaves >=1 window
    for a, b in zip(serial, piped):
        assert a.generated_tokens == b.generated_tokens


def test_speculation_skipped_for_streaming(slot_engine, monkeypatch):
    """Streaming requests keep per-chunk harvests (no stale deltas)."""
    monkeypatch.setenv("DSOCR_PIPELINE_CHUNKS", "1")
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=12, no_repeat_ngram_size=None)
    img = _img(92)
    seen = []
    sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                chunk_steps=4, stream_chunk_steps=4)

    async def go():
        return await sched.submit(
            "<image>stream", [img], VS, params,
            stream_cb=lambda n, toks: seen.append(n),
        )

    out = asyncio.run(go())
    assert sched.speculated_chunks == 0
    assert seen and seen[-1] == len(out.generated_tokens)


def test_prefill_wave_crash_fails_futures(slot_engine, monkeypatch):
    """An exception escaping _prepare_jobs entirely (not the per-job
    error path) must still resolve every submitted future — otherwise
    submit() awaits forever on a crashed prefill worker."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    imgs = [_img(40 + i) for i in range(3)]

    class Crashing(ContinuousScheduler):
        def _prepare_jobs(self, jobs):
            raise RuntimeError("synthetic wave crash")

    async def go():
        sched = Crashing(slot_engine, tok, n_slots=4, max_len=256,
                         chunk_steps=2, prefill_batch=2)
        return await asyncio.gather(
            *(sched.submit(f"<image>req{i}", [imgs[i]], VS, params)
              for i in range(3)),
            return_exceptions=True,
        )

    outs = asyncio.run(go())
    assert len(outs) == 3
    for out in outs:
        assert isinstance(out, RuntimeError)
        assert "synthetic wave crash" in str(out)


def _flaky_runner(sched, fail_on_calls):
    """Wrap the scheduler's runner.run_chunk_snap to raise a synthetic
    transient device fault on the given call numbers (1-based)."""
    sched._ensure_state()
    orig = sched._runner.run_chunk_snap
    calls = {"n": 0}

    def flaky(params, state, chunk):
        calls["n"] += 1
        if calls["n"] in fail_on_calls:
            raise RuntimeError("INVALID_ARGUMENT: TPU backend error (synthetic)")
        return orig(params, state, chunk)

    sched._runner.run_chunk_snap = flaky
    return calls


def test_chunk_fault_recovery_completes_all_requests(slot_engine):
    """A transient device fault mid-serve (the sporadic INVALID_ARGUMENT
    pattern) must not fail any request: the scheduler rebuilds its slot
    state, re-admits in-flight rows from their host-side token records
    (continuation prefill), and every output matches the fault-free
    greedy run (VERDICT r3 #3)."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=12, no_repeat_ngram_size=None)
    imgs = [_img(60 + i) for i in range(3)]
    solos = [
        slot_engine.decode(tok, f"<image>req{i}", [imgs[i]], VS, params)
        for i in range(3)
    ]

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=3, prefill_batch=2)
        # fail the 3rd chunk: some rows already harvested tokens, so the
        # continuation path (prefix re-prefill) is exercised
        _flaky_runner(sched, {3})
        outs = await asyncio.gather(
            *(sched.submit(f"<image>req{i}", [imgs[i]], VS, params)
              for i in range(3))
        )
        return outs, sched

    outs, sched = asyncio.run(go())
    assert sched.recoveries == 1
    for out, solo in zip(outs, solos):
        assert out.generated_tokens == solo.generated_tokens
        assert out.text == solo.text


def test_chunk_fault_first_chunk_recovery(slot_engine):
    """Fault on the FIRST chunk (no tokens harvested yet): rows restart
    from scratch and still complete."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None)
    img = _img(70)
    solo = slot_engine.decode(tok, "<image>fault0", [img], VS, params)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2)
        _flaky_runner(sched, {1})
        out = await sched.submit("<image>fault0", [img], VS, params)
        return out, sched

    out, sched = asyncio.run(go())
    assert sched.recoveries == 1
    assert out.generated_tokens == solo.generated_tokens


def test_persistent_fault_gives_up_and_fails_futures(slot_engine):
    """A fault that never clears must not loop forever: after the
    consecutive-recovery cap the in-flight futures fail with the device
    error."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None)
    img = _img(71)

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2)
        _flaky_runner(sched, set(range(1, 100)))
        return await asyncio.gather(
            sched.submit("<image>dead", [img], VS, params),
            return_exceptions=True,
        )

    outs = asyncio.run(go())
    assert isinstance(outs[0], RuntimeError)
    assert "INVALID_ARGUMENT" in str(outs[0])


def test_streamed_tokens_stay_consistent_across_recovery(slot_engine):
    """Streaming callbacks across a recovery must keep emitting the FULL
    monotonically-growing token list (prefix + regenerated tokens)."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=10, no_repeat_ngram_size=None)
    img = _img(72)
    solo = slot_engine.decode(tok, "<image>stream-fault", [img], VS, params)
    seen = []

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=1, max_len=256,
                                    chunk_steps=2, stream_chunk_steps=2)
        _flaky_runner(sched, {2})
        return await sched.submit(
            "<image>stream-fault", [img], VS, params,
            stream_cb=lambda n, toks: seen.append(list(toks)),
        ), sched

    out, sched = asyncio.run(go())
    assert sched.recoveries == 1
    assert out.generated_tokens == solo.generated_tokens
    for a, b in zip(seen, seen[1:]):
        assert b[: len(a)] == a  # prefixes grow monotonically
    assert seen[-1] == out.generated_tokens


def test_state_construction_failure_fails_futures(slot_engine, monkeypatch):
    """An exception from slot state construction (e.g. an invalid
    mesh/slot sharding) must fail the submitted futures — r4 found it
    killed the prefill worker silently and every submit() hung forever."""
    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)

    sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256)

    def boom(*a, **k):
        raise ValueError("synthetic state construction failure")

    monkeypatch.setattr(sched, "_ensure_state", boom)

    async def go():
        return await asyncio.gather(
            sched.submit("<image>x", [_img(80)], VS, params),
            sched.submit("<image>y", [_img(81)], VS, params),
            return_exceptions=True,
        )

    outs = asyncio.run(asyncio.wait_for(go(), timeout=60))
    assert len(outs) == 2
    for out in outs:
        assert isinstance(out, ValueError)
        assert "synthetic state construction" in str(out)


def test_streamed_restart_without_continuation_fails_loudly(slot_engine, monkeypatch):
    """An engine WITHOUT continuation prefill cannot resume a streamed
    request after a device fault — the job must fail with a clear error
    instead of silently streaming a non-extension token list (r4
    review). Non-streaming jobs on the same engine restart fine."""
    import inspect

    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=10, no_repeat_ngram_size=None)
    img = _img(90)
    solo = slot_engine.decode(tok, "<image>nostream", [img], VS, params)

    # hide the engine's continuation support from the scheduler
    real = slot_engine.prefill_for_slot

    def no_continuation(tokenizer, prompt, images, vision):
        return real(tokenizer, prompt, images, vision)

    monkeypatch.setattr(slot_engine, "prefill_for_slot", no_continuation)
    assert "extra_tokens" not in inspect.signature(
        slot_engine.prefill_for_slot
    ).parameters

    seen = []

    async def go():
        sched = ContinuousScheduler(slot_engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2, stream_chunk_steps=2)
        _flaky_runner(sched, {2})
        stream_task = asyncio.create_task(
            sched.submit("<image>stream-nc", [img], VS, params,
                         stream_cb=lambda n, toks: seen.append(n))
        )
        plain_task = asyncio.create_task(
            sched.submit("<image>nostream", [img], VS, params)
        )
        return await asyncio.gather(stream_task, plain_task,
                                    return_exceptions=True)

    streamed, plain = asyncio.run(go())
    # the streamed job with emitted tokens fails loudly...
    assert isinstance(streamed, RuntimeError)
    assert "cannot resume" in str(streamed)
    # ...while the non-streaming greedy job restarts and matches solo
    assert not isinstance(plain, Exception)
    assert plain.generated_tokens == solo.generated_tokens


def test_continuous_admission_cap_sheds(slot_engine):
    """DSOCR_MAX_INFLIGHT load shedding: submits beyond the cap raise
    QueueDepthExceeded (→ HTTP 503 upstream); capped submits and later
    retries still complete. The tail-TTFT lever is bounding the accepted
    queue, not reordering it (queue-wait conservation)."""
    from dsocr_tpu.server.scheduler import QueueDepthExceeded

    tok = SlotTokenizer()
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)

    async def go():
        sched = ContinuousScheduler(
            slot_engine, tok, n_slots=2, max_len=256, chunk_steps=2,
            max_inflight=2,
        )
        first = [
            asyncio.ensure_future(
                sched.submit("<image>q", [_img(40 + i)], VS, params)
            )
            for i in range(2)
        ]
        await asyncio.sleep(0)  # both submits enqueue before the probe
        try:
            await sched.submit("<image>q", [_img(43)], VS, params)
            shed = None
        except QueueDepthExceeded as err:
            shed = err
        outs = await asyncio.gather(*first)
        retry = await sched.submit("<image>q", [_img(43)], VS, params)
        return shed, outs, retry, sched

    shed, outs, retry, sched = asyncio.run(go())
    assert shed is not None and shed.retry_after_s >= 2.0
    assert sched.shed_requests == 1
    assert all(o.response_tokens > 0 for o in outs)
    assert retry.response_tokens > 0


def test_continuous_batched_join_matches_per_row(slot_engine, monkeypatch):
    """DSOCR_BATCH_JOIN: the one-dispatch wave join must produce the
    same tokens as per-row joins for a wave of mixed-params requests."""
    tok = SlotTokenizer()
    reqs = [
        ("<image>aa", _img(70), DecodeParameters(max_new_tokens=5,
                                                 no_repeat_ngram_size=None)),
        ("<image>bbb", _img(71), DecodeParameters(max_new_tokens=8,
                                                  repetition_penalty=1.5,
                                                  no_repeat_ngram_size=3)),
        ("<image>c", _img(72, 60, 40), DecodeParameters(max_new_tokens=6,
                                                        no_repeat_ngram_size=None)),
    ]

    def serve():
        async def go():
            sched = ContinuousScheduler(slot_engine, tok, n_slots=3,
                                        max_len=256, chunk_steps=3)
            return await asyncio.gather(
                *(sched.submit(p, [im], VS, pr) for p, im, pr in reqs)
            )

        return asyncio.run(go())

    monkeypatch.setenv("DSOCR_BATCH_JOIN", "0")
    per_row = serve()
    monkeypatch.setenv("DSOCR_BATCH_JOIN", "1")
    batched = serve()
    for a, b in zip(per_row, batched):
        assert a.generated_tokens == b.generated_tokens
