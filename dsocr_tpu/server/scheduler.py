"""Micro-batching scheduler: coalesce concurrent non-streaming requests
into one batched decode.

The reference serializes every request on a model mutex
(server/src/state.rs:22); this scheduler is the TPU-native replacement —
requests arriving within a short window batch into the engine's
left-padded `decode_batch`, multiplying page throughput at near-constant
latency (decode is HBM-bound, so batching rides for almost free).
Requests whose decode params differ, or models without a batched path,
fall back to sequential decode inside the same worker.
"""

from __future__ import annotations

import asyncio
import dataclasses
import functools
from typing import Any, List, Optional, Tuple

from ..core import DecodeOutcome, DecodeParameters, VisionSettings


@dataclasses.dataclass
class _Job:
    prompt: str
    images: List[Any]
    vision: VisionSettings
    params: DecodeParameters
    future: asyncio.Future

    def params_key(self) -> Tuple:
        p = self.params
        return (
            p.max_new_tokens, p.do_sample, p.temperature, p.top_p, p.top_k,
            p.repetition_penalty, p.no_repeat_ngram_size, p.seed, p.use_cache,
            self.vision,
        )


class BatchScheduler:
    def __init__(
        self,
        engine,
        tokenizer,
        max_batch: int = 8,
        window_ms: float = 25.0,
        lock: Optional[asyncio.Lock] = None,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.window_ms = window_ms
        self.lock = lock or asyncio.Lock()  # shared with streaming requests
        self.queue: asyncio.Queue = asyncio.Queue()
        self._worker_task: Optional[asyncio.Task] = None
        self.batch_sizes: List[int] = []  # observability

    async def submit(
        self,
        prompt: str,
        images: List[Any],
        vision: VisionSettings,
        params: DecodeParameters,
    ) -> DecodeOutcome:
        loop = asyncio.get_running_loop()
        job = _Job(prompt, images, vision, params, loop.create_future())
        await self.queue.put(job)
        if self._worker_task is None:
            self._worker_task = asyncio.create_task(self._worker())
        return await job.future

    async def _collect_batch(self, first: _Job) -> List[_Job]:
        loop = asyncio.get_running_loop()
        batch = [first]
        deadline = loop.time() + self.window_ms / 1000.0
        while len(batch) < self.max_batch:
            timeout = deadline - loop.time()
            if timeout <= 0:
                break
            try:
                batch.append(await asyncio.wait_for(self.queue.get(), timeout))
            except asyncio.TimeoutError:
                break
        return batch

    async def _process(self, batch: List[_Job]) -> None:
        loop = asyncio.get_running_loop()
        groups: dict = {}
        for job in batch:
            groups.setdefault(job.params_key(), []).append(job)
        for jobs in groups.values():
            self.batch_sizes.append(len(jobs))
            try:
                async with self.lock:
                    if len(jobs) > 1 and hasattr(self.engine, "decode_batch"):
                        outcomes = await loop.run_in_executor(
                            None,
                            functools.partial(
                                self.engine.decode_batch,
                                self.tokenizer,
                                [j.prompt for j in jobs],
                                [j.images for j in jobs],
                                jobs[0].vision,
                                jobs[0].params,
                            ),
                        )
                        for job, outcome in zip(jobs, outcomes):
                            job.future.set_result(outcome)
                    else:
                        for job in jobs:
                            outcome = await loop.run_in_executor(
                                None,
                                functools.partial(
                                    self.engine.decode,
                                    self.tokenizer,
                                    job.prompt,
                                    job.images,
                                    job.vision,
                                    job.params,
                                ),
                            )
                            job.future.set_result(outcome)
            except Exception as err:
                for job in jobs:
                    if not job.future.done():
                        job.future.set_exception(err)

    async def _worker(self):
        # Single cooperative worker; exits when idle (no awaits between the
        # empty check and the reset, so submit() cannot strand a job).
        try:
            while True:
                try:
                    first = self.queue.get_nowait()
                except asyncio.QueueEmpty:
                    return
                batch = await self._collect_batch(first)
                await self._process(batch)
        finally:
            self._worker_task = None
