"""Request scheduling: continuous (slot-based) batching, with a
micro-batching fallback for engines without a slot runner.

The reference serializes every request on a model mutex
(server/src/state.rs:22, generation.rs:84-86). The TPU-native
replacement is the ContinuousScheduler: a persistent B-slot decode loop
(runtime/slots.py) where requests join mid-flight after their own
prefill, finished rows free their slot immediately, streaming requests
participate, and per-request sampling params need not match (they ride
as per-row device arrays).

BatchScheduler (window micro-batching over decode_batch) remains as the
fallback for engines that expose decode_batch but not the slot surface.
"""

from __future__ import annotations

import asyncio
import dataclasses
import functools
import logging
import os
import time
from typing import Any, Callable, List, Optional, Tuple, Union

from ..core import DecodeOutcome, DecodeParameters, VisionSettings
from ..core.benchmark import Timer
from ..core.text import normalize_text
from ..runtime.generate import clamp_new_tokens
from .prefix_cache import PrefixCache, request_key

logger = logging.getLogger("dsocr.scheduler")

# DSOCR_SCHED_TRACE=1: timestamped pipeline events (wave grab/prep/put,
# join, chunk dispatch, harvest) for attributing serving bubbles —
# stage timers measure wall inside threads sharing one device queue,
# so only event ordering can show WHERE overlap is lost.
_TRACE = os.environ.get("DSOCR_SCHED_TRACE") == "1"
_trace_t0: List[float] = []


def _trace(event: str, **fields):
    if not _TRACE:
        return
    now = time.perf_counter()
    if not _trace_t0:
        _trace_t0.append(now)
    kv = " ".join(f"{k}={v}" for k, v in fields.items())
    print(f"[sched {now - _trace_t0[0]:8.3f}] {event} {kv}", flush=True)


class QueueDepthExceeded(RuntimeError):
    """Admission rejected: the scheduler's in-flight depth cap is full.

    TTFT at a deep burst is QUEUE WAIT, not scheduling: with uniform
    512-token jobs at ~2.3 pages/sec, the 95th of 96 requests must wait
    ~40 s for capacity no matter how admission is ordered (sum of waits
    is conserved by any non-preemptive reordering; r4 measured p95 39-48 s
    at 96-deep). The production lever is bounding the accepted queue —
    load shedding — so waiting happens upstream where clients can retry,
    balance, or back off. The server maps this to HTTP 503 + Retry-After."""

    def __init__(self, depth: int, cap: int, retry_after_s: float):
        super().__init__(
            f"serving queue full ({depth} in flight >= cap {cap}); "
            f"retry after ~{retry_after_s:.0f}s"
        )
        self.depth = depth
        self.cap = cap
        self.retry_after_s = retry_after_s


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


@dataclasses.dataclass
class _SlotJob:
    prompt: str
    images: List[Any]
    vision: VisionSettings
    params: DecodeParameters
    future: asyncio.Future
    stream_cb: Optional[Callable[[int, List[int]], None]] = None
    # filled at join time
    prompt_len: int = 0
    max_new: int = 0
    truncated: bool = False
    emitted: int = 0
    # wave-level device first-token selection (select_first_tokens);
    # None → join selects host-side from the packet logits
    first: Optional[int] = None
    # submit timestamp (perf_counter) for TTFT accounting
    t_submit: float = 0.0
    # fault-recovery records: tokens generated before the request's row
    # was re-prefilled as a continuation (prefix_tokens), and the full
    # generated-so-far snapshot from the last successful harvest
    prefix_tokens: List[int] = dataclasses.field(default_factory=list)
    generated: List[int] = dataclasses.field(default_factory=list)


class ContinuousScheduler:
    """Slot-based continuous batching over an engine's SlotRunner surface.

    Requires the engine to expose make_slot_runner / new_slot_cache /
    prefill_for_slot (models/deepseek/engine.py). One cooperative worker
    owns all device work: admit (prefill+join) → chunked decode → harvest
    (stream deltas, finalize finished rows) → repeat. Streaming requests
    get their callback invoked at every chunk boundary.
    """

    supports_streaming = True

    def __init__(
        self,
        engine,
        tokenizer,
        n_slots: Optional[int] = None,
        max_len: Optional[int] = None,
        chunk_steps: int = 32,
        stream_chunk_steps: int = 16,
        prefill_batch: Optional[int] = None,
        prefix_cache: Optional[int] = None,
        max_inflight: Optional[int] = None,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.n_slots = n_slots or int(os.environ.get("DSOCR_SLOTS", "8"))
        max_len = max_len or min(
            int(os.environ.get("DSOCR_SLOT_SEQ", "4096")),
            getattr(engine, "max_seq_len", 4096),
        )
        # Row KV blocks are padded to 128-token multiples at prefill; a
        # non-multiple capacity would pass clamp_new_tokens yet fail the
        # dynamic_update_slice insert with an XLA shape error for
        # near-capacity prompts. Align the capacity down instead.
        self.max_len = max(128, (max_len // 128) * 128)
        self.chunk_steps = chunk_steps
        self.stream_chunk_steps = stream_chunk_steps
        # prefill wave size: bigger waves pool the vision towers better
        # (throughput); smaller waves admit sooner (latency)
        self.prefill_batch = prefill_batch or max(2, self.n_slots // 2)
        # first-wave ramp: the FIRST wave of a cold pipeline is fully
        # serial (prepare → upload → towers → prefill before any decode
        # exists to overlap) — a smaller first wave starts decode sooner
        # and the full-size waves behind it overlap it. Measured (r4,
        # interleaved A/B at 96x16): +3-5% pages/sec and -20% TTFT p50
        # in both reps. DSOCR_FIRST_WAVE=0 disables.
        self._first_wave_batch = int(
            os.environ.get("DSOCR_FIRST_WAVE", "4")
        ) or None
        self._ramped = False  # becomes True once the first wave shipped
        self.queue: asyncio.Queue = asyncio.Queue()
        # prefilled packets awaiting a free slot; bounded so at most a
        # wave of prefill KV blocks sits in HBM while slots are busy
        self._ready_q: asyncio.Queue = asyncio.Queue(
            maxsize=max(2, self.prefill_batch)
        )
        self._worker_task: Optional[asyncio.Task] = None
        self._prefill_task: Optional[asyncio.Task] = None
        self._inflight = 0  # submitted, not yet resolved
        self._loop = None  # event loop the queues/tasks belong to
        self._stale_rows: List[int] = []  # to release after a loop switch
        self._runner = None
        self._state = None
        self._rows: List[Optional[_SlotJob]] = [None] * self.n_slots
        self._deferred: List[Tuple] = []  # pool-exhausted packets awaiting pages
        self.batch_sizes: List[int] = []  # occupancy per chunk (observability)
        # prefill-packet reuse for identical (prompt, images, vision)
        # requests; OFF by default — entries pin HBM (see prefix_cache.py)
        if prefix_cache is None:
            prefix_cache = int(os.environ.get("DSOCR_PREFIX_CACHE", "0"))
        self.prefix_cache = PrefixCache(prefix_cache) if prefix_cache > 0 else None
        # speculative chunk dispatch: issue chunk N+1 before harvesting
        # chunk N so the harvest's host<->device round-trip overlaps the
        # next chunk's compute (gated to cases where N+1 is guaranteed
        # useful — see _worker). DSOCR_PIPELINE_CHUNKS=0 disables.
        self._pipeline = os.environ.get("DSOCR_PIPELINE_CHUNKS", "1") != "0"
        self.speculated_chunks = 0  # observability (see /metrics)
        # per-request time-to-first-token samples (seconds, submit → the
        # request's first generated token is selected and its row is live
        # in the decode batch). BASELINE.json's metric line names p50
        # TTFT per page — bench.py and /metrics both report percentiles.
        # Bounded: a long-lived server must not grow one float per
        # request forever, and /metrics should reflect RECENT latency,
        # not the lifetime median.
        import collections

        self.ttft_samples: "collections.deque[float]" = collections.deque(
            maxlen=4096
        )
        # device-fault recovery (sporadic `INVALID_ARGUMENT: TPU backend
        # error` under sustained serving — CLAUDE.md): on a chunk/harvest
        # failure the worker rebuilds the slot state and re-admits every
        # in-flight row from its host-side record (prompt + generated-so-
        # far continuation prefill) instead of failing all futures.
        # `recoveries` counts total recoveries (observability);
        # `_consecutive_failures` gates giving up after repeated faults
        # with no successful harvest in between.
        self.recoveries = 0
        self._consecutive_failures = 0
        self._max_consecutive_failures = int(
            os.environ.get("DSOCR_SCHED_MAX_RECOVERIES", "3")
        )
        # tail-TTFT admission cap (0 = unbounded, the default): reject
        # submits beyond this in-flight depth with QueueDepthExceeded →
        # HTTP 503 + Retry-After (see the exception's docstring for why
        # load shedding is the right TTFT lever). `shed_requests` counts
        # rejections for /metrics.
        if max_inflight is None:
            max_inflight = int(os.environ.get("DSOCR_MAX_INFLIGHT", "0"))
        self.max_inflight = max_inflight or None
        self.shed_requests = 0

    # -- public API ----------------------------------------------------------

    async def submit(
        self,
        prompt: str,
        images: List[Any],
        vision: VisionSettings,
        params: DecodeParameters,
        stream_cb: Optional[Callable[[int, List[int]], None]] = None,
    ) -> DecodeOutcome:
        loop = asyncio.get_running_loop()
        if self._loop is not loop:
            # A fresh event loop (e.g. repeated asyncio.run): asyncio
            # queues bind to the loop on their first blocking put/get and
            # then raise 'bound to a different event loop'. The old
            # loop's workers are dead with it; reset the loop-bound
            # pieces (device-side slot state is loop-independent).
            self.queue = asyncio.Queue()
            self._ready_q = asyncio.Queue(maxsize=self._ready_q.maxsize)
            self._worker_task = None
            self._prefill_task = None
            self._inflight = 0
            # rows abandoned by a crashed loop: free them at worker start
            self._stale_rows.extend(
                r for r, j in enumerate(self._rows) if j is not None
            )
            self._rows = [None] * self.n_slots
            self._deferred = []
            if self._state_invalid():
                # the old loop died with a donating jit (chunk/join) still
                # in flight on an executor thread: its dropped result left
                # self._state referencing deleted buffers. Rebuild.
                self._state = None
                self._stale_rows.clear()
            self._loop = loop
        if self.max_inflight and self._inflight >= self.max_inflight:
            self.shed_requests += 1
            # Retry-After estimate: one wave's worth of decode at the
            # recent TTFT pace, floored at a few seconds
            recent = list(self.ttft_samples)[-self.n_slots :]
            pace = (sum(recent) / len(recent)) if recent else 5.0
            raise QueueDepthExceeded(
                self._inflight, self.max_inflight, max(2.0, pace)
            )
        job = _SlotJob(prompt, images, vision, params, loop.create_future(), stream_cb)
        job.t_submit = time.perf_counter()
        self._inflight += 1
        await self.queue.put(job)
        self._ensure_workers()
        return await job.future

    # -- workers ----------------------------------------------------------------
    #
    # Two cooperative tasks pipeline the request stages: the PREFILL worker
    # runs vision + prompt prefill for queued requests (host resampling and
    # transfers overlap the decode dispatches), while the DECODE worker
    # steps all active slots in chunks, admits ready packets into free
    # slots between chunks, streams deltas, and frees finished rows.

    def _ensure_workers(self):
        if self._prefill_task is None:
            self._prefill_task = asyncio.get_running_loop().create_task(
                self._prefill_worker()
            )
        if self._worker_task is None:
            self._worker_task = asyncio.get_running_loop().create_task(
                self._worker()
            )

    def _state_invalid(self) -> bool:
        """True when any device buffer in the slot state has been deleted
        (a donating jit's result was dropped mid-teardown)."""
        if self._state is None:
            return False
        try:
            import jax

            return any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(self._state)
            )
        except Exception:
            return True

    def _ensure_state(self):
        paged = (
            os.environ.get("DSOCR_PAGED_KV") == "1"
            and hasattr(self.engine, "make_paged_slot_runner")
        )
        if self._runner is None:
            if paged:
                # paged slot KV: shared page pool + per-row page tables
                # (runtime/paged.py) — rows hold prompt+budget pages
                # instead of a worst-case [S_max] row
                self._runner, self._paged_cache = (
                    self.engine.make_paged_slot_runner(self.n_slots, self.max_len)
                )
            else:
                self._runner = self.engine.make_slot_runner()
        if self._state is None:
            if paged:
                cache = getattr(self, "_paged_cache", None)
                if cache is None:
                    _, cache = self.engine.make_paged_slot_runner(
                        self.n_slots, self.max_len
                    )
                self._paged_cache = None  # the state owns it now
                self._state = self._runner.init_state(
                    cache, context_len=self.max_len
                )
            else:
                cache = self.engine.new_slot_cache(self.n_slots, self.max_len)
                self._state = self._runner.init_state(
                    cache, context_len=self.max_len
                )

    def _free_rows(self) -> List[int]:
        return [r for r, job in enumerate(self._rows) if job is None]

    def _validate_job(self, job: _SlotJob) -> None:
        """Raise for params the slot runtime cannot honor exactly."""
        validate = getattr(self.engine, "validate_slot_params", None)
        if validate is not None:  # e.g. GLM is greedy-only
            validate(job.params)
        ngram = job.params.no_repeat_ngram_size
        ngram_max = self._runner.ngram_max if self._runner is not None else None
        if ngram_max is not None and ngram and ngram > ngram_max:
            # the static slot ngram window would silently match a shorter
            # prefix and over-ban, diverging from the solo Generator path
            raise ValueError(
                f"no_repeat_ngram_size={ngram} exceeds this server's slot "
                f"runtime limit ({ngram_max})"
            )

    def _prepare_job(self, job: _SlotJob) -> dict:
        """Blocking (host + device): vision, prompt build, single-row
        prefill. Slot-independent — runs while other rows decode."""
        pre = self.engine.prefill_for_slot(
            self.tokenizer, job.prompt, job.images, job.vision
        )
        return self._finish_prepare(job, pre)

    def _join_ready(
        self, row: int, job: _SlotJob, pre: dict, budget: Optional[int] = None
    ) -> bool:
        """Blocking (device): insert a prefilled packet into slot `row`.
        `budget` overrides the row's append budget (continuation re-
        admission after a device fault: max_new minus tokens already
        generated)."""
        _trace("join", row=row)
        with Timer("slot.join"):
            self._state, finished, first = self._runner.join(
                self._state,
                row,
                pre["row_k"],
                pre["row_v"],
                pre["prompt_ids"],
                pre["logits"],
                job.params,
                job.max_new if budget is None else budget,
                pos0=pre["pos0"],
                first=job.first,
            )
        return finished

    def _record_ttft(self, job: _SlotJob) -> None:
        """Sample TTFT at join success — the request's first token is
        selected during prefill/join and the row is live for decode, so
        this is when a streaming client could first see output."""
        self.ttft_samples.append(time.perf_counter() - job.t_submit)

    async def _release_row_and_finalize(self, loop, row, job, tokens) -> None:
        """Release the row's resources, THEN resolve the future: once the
        last future resolves, asyncio.run can tear the loop down and a
        release scheduled after it silently never runs — harmless for
        contiguous KV but it leaked paged pool pages (r4)."""
        self._state = await loop.run_in_executor(
            None, self._runner.release, self._state, row
        )
        self._finalize(job, tokens)

    def _finalize(self, job: _SlotJob, tokens: List[int]) -> None:
        text = normalize_text(
            self.tokenizer.decode(tokens, skip_special_tokens=True)
        )
        self._inflight -= 1
        if not job.future.done():
            job.future.set_result(
                DecodeOutcome(
                    text=text,
                    prompt_tokens=job.prompt_len,
                    response_tokens=len(tokens),
                    generated_tokens=tokens,
                    truncated=job.truncated,
                )
            )

    def _fail(self, job: _SlotJob, err: Exception) -> None:
        self._inflight -= 1
        if not job.future.done():
            job.future.set_exception(err)

    def _prepare_jobs(
        self, jobs: List[_SlotJob]
    ) -> List[Union[dict, Exception]]:
        """Blocking: batched vision + per-row prefill when the engine
        supports it (prefill_for_slots pools the tower passes — the
        serving pipeline is prefill-bound); falls back to per-job
        prepare. Returns one packet (or the failure) per job. Runs on an
        executor thread, so futures are NEVER touched here — the prefill
        worker resolves failures on the event-loop thread."""
        batched = getattr(self.engine, "prefill_for_slots", None)
        packets: List[Union[dict, Exception, None]] = [None] * len(jobs)
        todo = []
        keys: List[Optional[str]] = [None] * len(jobs)
        for i, job in enumerate(jobs):
            try:
                self._validate_job(job)
                if self.prefix_cache is not None:
                    # inside the try: a bad image object (e.g. a truncated
                    # lazily-decoded PIL file raising in np.asarray) must
                    # fail ITS job, not strand the whole wave's futures
                    keys[i] = request_key(job.prompt, job.images, job.vision)
            except Exception as err:
                packets[i] = err
                continue
            if keys[i] is not None:
                hit = self.prefix_cache.get(keys[i])
                if hit is not None:
                    with Timer("slot.prefix_hit"):
                        packets[i] = self._finish_prepare(job, hit)
                    continue
                # identical request already being prefilled in this wave:
                # alias the rest to the first occurrence (a hit in effect —
                # count it as one so /metrics hit-rates reflect saved work)
                first = next((j for j in todo if keys[j] == keys[i]), None)
                if first is not None:
                    self.prefix_cache.record_alias_hit()
                    keys[i] = ("alias", first)
                    continue
            todo.append(i)
        if batched is not None and len(todo) > 1:
            try:
                pres = batched(
                    self.tokenizer,
                    [
                        (jobs[i].prompt, jobs[i].images, jobs[i].vision)
                        for i in todo
                    ],
                )
                for i, pre in zip(todo, pres):
                    packets[i] = self._finish_prepare(jobs[i], pre)
            except Exception:
                # fall through to the per-job path for clean per-request
                # errors — but never silently: this doubles vision work
                # and can mask device failures (e.g. transient tunnel
                # INVALID_ARGUMENT)
                logger.warning(
                    "batched prefill of %d jobs failed; retrying per-request",
                    len(todo),
                    exc_info=True,
                )
        for i in todo:
            if packets[i] is not None:
                continue
            try:
                packets[i] = self._prepare_job(jobs[i])
            except Exception as err:
                packets[i] = err
        if self.prefix_cache is not None:
            for i in todo:
                if isinstance(packets[i], dict) and keys[i] is not None:
                    self.prefix_cache.put(keys[i], packets[i])
            for i, key in enumerate(keys):
                if not isinstance(key, tuple):  # only wave-local aliases
                    continue
                src = packets[key[1]]
                if isinstance(src, dict):
                    packets[i] = self._finish_prepare(jobs[i], src)
                else:
                    packets[i] = src or RuntimeError("prefill failed")
        # Wave-level device first-token selection: one jitted call + one
        # [B]-int pull replaces a [V]-f32 host pull per row at join (the
        # firsts ride on the JOBS — packets may be shared via the prefix
        # cache across jobs with different sampling params).
        ok = [i for i, p in enumerate(packets) if isinstance(p, dict)]
        if ok and self._runner is not None:
            try:
                firsts = self._runner.select_first_tokens(
                    [packets[i] for i in ok],
                    [jobs[i].params for i in ok],
                    pad_to=self.prefill_batch,
                )
                for i, tok in zip(ok, firsts):
                    jobs[i].first = tok
            except Exception:
                logger.warning(
                    "wave first-token selection failed; join will select "
                    "host-side",
                    exc_info=True,
                )
        return packets

    def _finish_prepare(self, job: _SlotJob, pre: dict) -> dict:
        job.prompt_len = len(pre["prompt_ids"])
        requested = job.params.max_new_tokens
        job.max_new = clamp_new_tokens(job.prompt_len, requested, self.max_len)
        job.truncated = job.max_new < requested
        return pre

    def _grab_wave(self) -> List[_SlotJob]:
        limit = self.prefill_batch
        if not self._ramped and self._first_wave_batch:
            limit = min(limit, self._first_wave_batch)
        jobs: List[_SlotJob] = []
        while len(jobs) < limit:
            try:
                jobs.append(self.queue.get_nowait())
            except asyncio.QueueEmpty:
                break
        if jobs:
            self._ramped = True
        return jobs

    async def _prefill_worker(self):
        # NOTE: cross-wave upload prefetch (prepping wave N+1's pixels
        # while wave N prefills) was built and A/B-measured SLOWER here
        # (1.03 vs 1.55 pages/sec at 32x16): wave N+1's bulk pixel bytes
        # share the one tunneled device link with wave N's critical-path
        # round trips (joins, prefill dispatch, first-token pulls) and
        # delay them, while wave N+1's prepare already overlaps wave N's
        # DECODE — which has only ~1 round trip per 128-step chunk — for
        # free. Sequential waves + 2 concurrent transfer streams win.
        loop = asyncio.get_running_loop()
        try:
            while True:
                jobs = self._grab_wave()
                if not jobs:
                    return
                try:
                    self._ensure_state()
                except Exception as err:
                    # runner/state construction failure (e.g. an invalid
                    # mesh/slot sharding): fail THIS wave's futures and
                    # keep draining — an exception escaping the worker
                    # here left every submit() awaiting forever (r4)
                    logger.exception("slot state construction failed")
                    for job in jobs:
                        self._fail(job, err)
                    continue
                _trace("wave_grab", n=len(jobs))
                prepare_fut = loop.run_in_executor(
                    None, self._prepare_jobs, jobs
                )
                try:
                    packets = await prepare_fut
                except Exception as err:
                    # a crash OUTSIDE the per-job error handling (e.g. a
                    # broken _prepare_jobs override) must fail the wave's
                    # futures — an unhandled worker exception would leave
                    # every submit() awaiting forever
                    logger.exception("prefill wave crashed")
                    packets = [err] * len(jobs)
                _trace("wave_prepared", n=len(jobs))
                for job, pre in zip(jobs, packets):
                    if isinstance(pre, Exception) or pre is None:
                        # resolve failures HERE, on the loop thread —
                        # asyncio futures are not thread-safe
                        self._fail(job, pre or RuntimeError("prefill failed"))
                        continue
                    await self._ready_q.put((job, pre))  # backpressure when full
                    _trace("packet_put", qsize=self._ready_q.qsize())
                    self._ensure_workers()  # decode worker may have exited idle
        finally:
            self._prefill_task = None

    async def _admit_one(self, loop, row, job, pre) -> bool:
        """Admit one packet into `row`. Returns False when admission must
        pause (paged pool exhausted — the item was re-deferred)."""
        try:
            finished = await loop.run_in_executor(
                None, self._join_ready, row, job, pre
            )
        except MemoryError as err:
            # paged pool temporarily exhausted: defer until active
            # rows release pages; fail only if nothing will ever free
            if any(j is not None for j in self._rows):
                self._deferred.append((job, pre))
                return False
            self._fail(job, err)
            return True
        except Exception as err:
            self._fail(job, err)
            return True
        self._record_ttft(job)
        if finished:
            # the join allocated row resources (paged: pool pages)
            # even though the row never decodes
            await self._release_row_and_finalize(loop, row, job, [])
        else:
            self._rows[row] = job
        return True

    def _join_many_blocking(self, rows, jobs, pres):
        _trace("join_many", rows=len(rows))
        with Timer("slot.join"):
            state, finished, firsts = self._runner.join_many(
                self._state, rows, pres,
                [j.params for j in jobs],
                [j.max_new for j in jobs],
                [j.first for j in jobs],
            )
        self._state = state
        return finished

    async def _admit_ready(self, loop) -> None:
        free = self._free_rows()
        items: List[Tuple] = []
        while len(items) < len(free):
            if self._deferred:
                items.append(self._deferred.pop(0))
            else:
                try:
                    items.append(self._ready_q.get_nowait())
                except asyncio.QueueEmpty:
                    break
        if not items:
            return
        # Batched wave join (DSOCR_BATCH_JOIN=1): one jitted insert per
        # same-s_pad group instead of a per-row dispatch each. Measured
        # SLOWER on the real chip (r5 interleaved A/B at 96x16: 1.43/1.83
        # vs 2.14/2.14 pages/sec, bench_logs/r5/ab4_join.log): per-row
        # joins dispatch async and never stalled the loop, while the
        # batched path pays a materialized [R, L, 1, H, s, D] stack of
        # the wave's KV rows plus a 16-step scanned update over the full
        # slot state. Default OFF; kept for narrow-wave setups where the
        # dispatch count dominates.
        use_batch = (
            len(items) > 1
            and self._runner is not None
            and getattr(self._runner, "supports_join_many", False)
            and os.environ.get("DSOCR_BATCH_JOIN", "0") == "1"
        )
        if use_batch:
            groups: dict = {}
            for (job, pre), row in zip(items, free):
                key = pre["row_k"].shape[3]
                groups.setdefault(key, []).append((row, job, pre))
            for entries in groups.values():
                if len(entries) == 1:
                    row, job, pre = entries[0]
                    await self._admit_one(loop, row, job, pre)
                    continue
                rows = [r for r, _, _ in entries]
                jobs = [j for _, j, _ in entries]
                pres = [p for _, _, p in entries]
                try:
                    finished = await loop.run_in_executor(
                        None, self._join_many_blocking, rows, jobs, pres
                    )
                except Exception:
                    # isolate failures per request on the fallback path
                    # (a donated-state failure is caught by the worker's
                    # recovery like any chunk fault)
                    logger.warning(
                        "batched join of %d rows failed; retrying per-row",
                        len(rows), exc_info=True,
                    )
                    for row, job, pre in entries:
                        await self._admit_one(loop, row, job, pre)
                    continue
                for (row, job, _), fin in zip(entries, finished):
                    self._record_ttft(job)
                    if fin:
                        await self._release_row_and_finalize(loop, row, job, [])
                    else:
                        self._rows[row] = job
            return
        for i, ((job, pre), row) in enumerate(zip(items, free)):
            if not await self._admit_one(loop, row, job, pre):
                # admission paused (pool exhausted): keep the untried
                # items queued in order behind the re-deferred one
                self._deferred.extend(items[i + 1 :])
                return

    async def _worker(self):
        loop = asyncio.get_running_loop()
        try:
            while True:
                self._ensure_state()
                while self._stale_rows:
                    row = self._stale_rows.pop()
                    self._state = await loop.run_in_executor(
                        None, self._runner.release, self._state, row
                    )
                await self._admit_ready(loop)
                active_jobs = [j for j in self._rows if j is not None]
                if not active_jobs:
                    if self._inflight == 0:
                        # pipeline drained: the next burst is cold again,
                        # so the first-wave ramp re-arms
                        self._ramped = False
                        return
                    # prefills in flight: block on the ready queue instead
                    # of poll-spinning (the single host core is what the
                    # prefill work needs). Timeout re-checks _inflight in
                    # case every pending job failed at prefill.
                    if self._ready_q.empty():
                        try:
                            item = await asyncio.wait_for(
                                self._ready_q.get(), timeout=0.25
                            )
                        except asyncio.TimeoutError:
                            continue
                        # hand the packet straight to the first free slot
                        job, pre = item
                        row = self._free_rows()[0]
                        try:
                            finished = await loop.run_in_executor(
                                None, self._join_ready, row, job, pre
                            )
                        except Exception as err:
                            self._fail(job, err)
                            continue
                        self._record_ttft(job)
                        if finished:
                            await self._release_row_and_finalize(
                                loop, row, job, []
                            )
                        else:
                            self._rows[row] = job
                    continue
                self.batch_sizes.append(len(active_jobs))
                _trace("chunk_start", occ=len(active_jobs))
                chunk = (
                    self.stream_chunk_steps
                    if any(j.stream_cb is not None for j in active_jobs)
                    else self.chunk_steps
                )
                # Adaptive admission chunking (DSOCR_ADMIT_CHUNK=N):
                # packets that finish prefill mid-chunk wait a full chunk
                # (+speculation) for a slot while decode runs at reduced
                # occupancy (r5 trace, bench_logs/r5/trace_rep.log) —
                # short chunks while slots are free and a prefill wave is
                # brewing cut that admission latency. Measured SLOWER on
                # the tunneled chip (interleaved 96x16: 1.85/1.99 vs
                # 2.14/2.04 pages/sec, ab6_admit.log): each extra chunk
                # boundary pays a dispatch+harvest round trip that
                # outweighs the recovered idle. Default OFF; useful where
                # dispatch latency is small (local PCIe hosts).
                admit_chunk = int(os.environ.get("DSOCR_ADMIT_CHUNK", "0"))
                if (
                    admit_chunk
                    and self._free_rows()
                    and self._prefill_task is not None
                ):
                    chunk = min(chunk, admit_chunk)
                try:
                    await self._run_chunks_and_harvest(loop, active_jobs, chunk)
                except Exception as err:
                    if not await self._recover_device_failure(loop, err):
                        raise
        except Exception as err:
            # the decode worker must never die leaving futures stranded:
            # fail every in-flight row and every prefilled packet still
            # queued for admission (their submit()s await forever
            # otherwise), then re-raise for the task's own record
            for row, job in enumerate(self._rows):
                if job is not None:
                    self._fail(job, err)
                    self._rows[row] = None
            while True:
                try:
                    job, _pre = self._ready_q.get_nowait()
                except asyncio.QueueEmpty:
                    break
                self._fail(job, err)
            for job, _pre in self._deferred:
                self._fail(job, err)
            self._deferred = []
            raise
        finally:
            self._worker_task = None

    async def _run_chunks_and_harvest(self, loop, active_jobs, chunk) -> None:
        chunk_t = Timer("slot.decode_chunk")
        self._state, snap = await loop.run_in_executor(
            None,
            functools.partial(
                self._runner.run_chunk_snap,
                self.engine.params, self._state, chunk,
            ),
        )
        chunk_t.finish()
                # Speculative dispatch: when chunk N+1 is guaranteed to be
                # useful — no packet waiting for a slot, nobody streaming
                # (stale deltas), and no active row can exhaust its budget
                # within two chunks — issue it BEFORE harvesting chunk N,
                # so the harvest round-trip overlaps its compute. Rows
                # that hit EOS mid-chunk idle masked for one chunk.
        snaps = [snap]
        if (
            self._pipeline
            and self._ready_q.empty()
            and not self._deferred
            # a packet finishing prefill mid-speculation would
            # wait TWO chunks for a free slot — only speculate
            # when slots are full or no prefill can complete
            and (
                not self._free_rows()
                or (self.queue.empty() and self._prefill_task is None)
            )
            and all(j.stream_cb is None for j in active_jobs)
            and all(
                j.emitted + 2 * chunk <= j.max_new for j in active_jobs
            )
        ):
            self.batch_sizes.append(len(active_jobs))
            self.speculated_chunks += 1
            chunk_t = Timer("slot.decode_chunk")
            self._state, snap2 = await loop.run_in_executor(
                None,
                functools.partial(
                    self._runner.run_chunk_snap,
                    self.engine.params, self._state, chunk,
                ),
            )
            chunk_t.finish()
            snaps.append(snap2)
        for sn in snaps:
            # harvest blocks on its chunk's device_get — wall time
            # is (device chunk time - overlap) + transfer
            harvest_t = Timer("slot.harvest")
            harvest = await loop.run_in_executor(
                None, self._runner.harvest_from_snap, sn
            )
            harvest_t.finish(rows=len(active_jobs))
            _trace("harvest_done", occ=len(active_jobs))
            self._consecutive_failures = 0
            await self._process_harvest(loop, harvest)

    async def _recover_device_failure(self, loop, err: Exception) -> bool:
        """Chunk/harvest recovery for transient device faults: rebuild
        the slot state and re-admit every in-flight row from its host-
        side record (prompt + generated-so-far continuation prefill).
        Jobs whose re-prefill also fails are the only ones failed.
        Returns False when recovery should not be attempted (too many
        consecutive faults, or state rebuild itself failed) — the caller
        then re-raises and the crash path fails the in-flight futures.

        The reference has no analogue (its model mutex serializes and a
        failure kills only the single request); this is the serving
        robustness story continuous batching needs (VERDICT r3 #3)."""
        self._consecutive_failures += 1
        inflight = [(r, j) for r, j in enumerate(self._rows) if j is not None]
        if self._consecutive_failures > self._max_consecutive_failures:
            logger.error(
                "device fault persisted across %d recoveries; giving up",
                self._consecutive_failures - 1,
            )
            for _, job in inflight:
                self._fail(job, err)
            self._rows = [None] * self.n_slots
            # the failed chunk DONATED the state's buffers — drop it so
            # requests submitted after the fault clears rebuild instead
            # of hitting deleted buffers forever, and let them attempt
            # recovery afresh
            self._state = None
            self._runner = None  # paged: orphaned page allocations too
            self._consecutive_failures = 0
            return False
        logger.warning(
            "device chunk failed (%s: %s); rebuilding slot state and "
            "re-admitting %d in-flight rows",
            type(err).__name__, err, len(inflight),
        )
        self.recoveries += 1
        self._rows = [None] * self.n_slots
        self._state = None
        # paged runner: the host-side page allocator still records the
        # crashed rows' pages (their release() never ran) — free every
        # row's pages before re-admission; a leaked pool exhausts after
        # a few recoveries otherwise. (Contiguous runners have no
        # host-side allocation state and no release_all_rows.)
        release_all = getattr(self._runner, "release_all_rows", None)
        if release_all is not None:
            release_all()
        self._stale_rows.clear()
        try:
            self._ensure_state()
        except Exception:
            logger.exception("slot state rebuild failed")
            for _, job in inflight:
                self._fail(job, err)
            return False
        import inspect

        try:
            supports_continuation = "extra_tokens" in inspect.signature(
                self.engine.prefill_for_slot
            ).parameters
        except (TypeError, ValueError):
            supports_continuation = False
        for _, job in inflight:
            prefix = list(job.generated)
            remaining = job.max_new - len(prefix)
            if remaining <= 0:
                # budget was exhausted at the last harvest already
                self._finalize(job, prefix)
                continue
            if not supports_continuation:
                if job.stream_cb is not None and job.emitted > 0:
                    # a restart would stream a token list that is NOT an
                    # extension of what the client already received —
                    # fail loudly rather than silently diverge
                    self._fail(
                        job,
                        RuntimeError(
                            "device fault interrupted a streamed request "
                            "and this engine cannot resume from the "
                            "generated prefix (no continuation prefill)"
                        ),
                    )
                    continue
                # restart from scratch: greedy regenerates identically;
                # sampled output is nondeterministic to the client anyway
                prefix = []
                remaining = job.max_new
            try:
                if prefix:
                    pre = await loop.run_in_executor(
                        None,
                        functools.partial(
                            self.engine.prefill_for_slot,
                            self.tokenizer, job.prompt, job.images,
                            job.vision, extra_tokens=prefix,
                        ),
                    )
                else:
                    pre = await loop.run_in_executor(
                        None,
                        functools.partial(
                            self.engine.prefill_for_slot,
                            self.tokenizer, job.prompt, job.images,
                            job.vision,
                        ),
                    )
            except Exception as err2:
                self._fail(job, err2)
                continue
            job.prefix_tokens = prefix
            job.emitted = len(prefix)
            job.first = None  # select the next token from the new logits
            row = self._free_rows()[0]
            try:
                finished = await loop.run_in_executor(
                    None, self._join_ready, row, job, pre, remaining
                )
            except Exception as err2:
                self._fail(job, err2)
                continue
            if finished:
                await self._release_row_and_finalize(loop, row, job, prefix)
            else:
                self._rows[row] = job
        return True

    async def _process_harvest(self, loop, harvest) -> None:
        for row, job in enumerate(self._rows):
            if job is None:
                continue
            tokens = job.prefix_tokens + harvest.generated(row)
            job.generated = tokens  # host-side record for fault recovery
            if job.stream_cb is not None and len(tokens) > job.emitted:
                try:
                    job.stream_cb(len(tokens), tokens)
                except Exception:
                    pass
            job.emitted = len(tokens)
            if not harvest.active[row]:
                self._rows[row] = None
                with Timer("slot.release"):
                    await self._release_row_and_finalize(loop, row, job, tokens)


class BatchScheduler:
    supports_streaming = False

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
