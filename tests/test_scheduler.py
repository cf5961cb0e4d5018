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
