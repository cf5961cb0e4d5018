"""Headline bench: DeepSeek-OCR (3B MoE decoder + SAM/CLIP towers, bf16)
document OCR throughput on one TPU chip.

Workload mirrors the reference's README benchmark (BASELINE.md): ~1024px
document pages, crop mode, 512 new tokens per page, greedy with
no_repeat_ngram=20 — the reference's Accelerate-CPU number is ~30.1 s per
page (~0.0333 pages/sec). Weights are random-init (no weights ship with
this machine); FLOPs and memory traffic are identical to real weights,
so throughput is representative.

The headline metric is CONTINUOUS-BATCHING SERVING throughput: N
concurrent requests through the slot scheduler (the framework's
replacement for the reference's model mutex), which pipelines host
preprocessing, vision towers, prefill, and chunked batched decode.
Extra fields report the single-request latency path.

Env knobs: BENCH_REQUESTS (default 96 — request-count sweep measured
32→96 reqs at +15-20% pages/sec in interleaved same-process reps: more
waves amortize the first wave's unoverlapped prepare; marginal
steady-state rate is ~16 pages / 5.9s wave), BENCH_SLOTS (16),
BENCH_MAX_NEW_TOKENS (512), BENCH_REPS (2), BENCH_CHUNK (128),
BENCH_PREFILL_BATCH (= slots), BENCH_QUANT (q8_0 | q4_k | q6_k | ''),
BENCH_KV_QUANT (int8 | ''; default int8),
BENCH_BATCH1 (1 → also measure single-request latency),
BENCH_DEBUG (occupancy + stage breakdown on stderr),
BENCH_PROBE_TIMEOUT (seconds to wait out a wedged/down tunnel; default 3600).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
# random-init quantized decoder trees are pure functions of
# (config, seed, method) — cache them on disk so repeated bench
# processes skip the ~15 min single-core init+quantize
os.environ.setdefault("DSOCR_INIT_CACHE", "/tmp/dsocr_init_cache")

import numpy as np

BASELINE_PAGES_PER_SEC = 1.0 / 30.078  # reference decode.generate, README.md:155


def probe_tunnel(timeout_s: float = 3600.0) -> float:
    """1-op matmul probe; shared implementation in dsocr_tpu.bench.probe."""
    from dsocr_tpu.bench.probe import probe_tunnel as _probe

    return _probe(timeout_s, tag="bench")


def main():
    import jax

    # env vars are too late on this machine (site hook auto-imports jax
    # before bench.py runs) — the config update is what actually enables
    # the persistent compile cache.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("BENCH_TINY") == "1" and os.environ.get("BENCH_DEVICE") != "tpu":
        # tiny smoke mode runs on CPU by default (no tunnel dependency)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    try:
        backend = jax.default_backend()
    except Exception as err:
        # backend init itself raises (observed: 25 min block then
        # UNAVAILABLE when the tunnel is fully down) — let the probe's
        # clear_backends/retry loop wait it out rather than dying here
        print(f"[bench] backend init failed ({err}); probing", file=sys.stderr)
        backend = None
    if backend != "cpu":
        # observed axon outages last tens of minutes to hours — spend up
        # to an hour waiting before declaring the capture impossible
        probe_s = probe_tunnel(float(os.environ.get("BENCH_PROBE_TIMEOUT", "3600")))
        print(f"[bench] tunnel probe ok ({probe_s:.1f}s)", file=sys.stderr)

    from dsocr_tpu.bench.workload import BenchTokenizer, load_page_image
    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig
    from dsocr_tpu.server.scheduler import ContinuousScheduler

    max_new = int(os.environ.get("BENCH_MAX_NEW_TOKENS", "512"))
    n_requests = int(os.environ.get("BENCH_REQUESTS", "96"))
    n_slots = int(os.environ.get("BENCH_SLOTS", "16"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    # BENCH_TINY=1: tiny random config on whatever backend is available —
    # exercises the FULL bench code path (engine init incl. quantized
    # packing, scheduler, reps, retries, JSON) without a TPU; numbers
    # are meaningless
    tiny = os.environ.get("BENCH_TINY") == "1"
    # measured best serving config on v5e-1: packed-Q8 decode at 16 slots
    # + int8 KV (1.35 pages/sec) beats q8+f KV (1.30) and bf16@8 (0.91) —
    # q8's dense all-expert decode step streams 4x fewer weight bytes,
    # int8 KV halves the per-step cache streaming, and towers/prefill
    # pipeline behind the longer 16-row chunks
    quant = os.environ.get("BENCH_QUANT", "q8_0") or None
    kv_quant = os.environ.get("BENCH_KV_QUANT", "int8") or None

    t_init = time.perf_counter()
    if tiny:
        from dsocr_tpu.models.deepseek.config import tiny_deepseek_config

        # quantize passes through so the smoke run covers the packing +
        # dequant-kernel paths the real capture uses (dims that miss the
        # block size fall back to float, which is fine for a smoke)
        engine = DeepseekOcrEngine(
            tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024,
            quantize=quant, kv_quant=kv_quant,
        )
    else:
        engine = DeepseekOcrEngine(
            DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096,
            quantize=quant, kv_quant=kv_quant,
        )
    print(
        f"[bench] engine ready ({time.perf_counter() - t_init:.0f}s)",
        file=sys.stderr,
    )
    image = load_page_image("BENCH_IMAGE", tiny)

    settings = (
        VisionSettings(base_size=64, image_size=64, crop_mode=False)
        if tiny
        else VisionSettings(base_size=1024, image_size=640, crop_mode=True)
    )
    params = DecodeParameters(max_new_tokens=max_new)  # greedy, ngram=20 defaults
    tokenizer = BenchTokenizer()

    # slot cache sized to the workload: prompt (~1.7k tokens at 1024px
    # crop mode) + generation budget, 128-aligned
    probe = engine.prepare_vision_input(image, settings)
    emb = engine.compute_image_embedding(probe)
    tokens, _ = engine.build_prompt_tokens(
        tokenizer, "<image>\nFree OCR.", [probe], [emb], settings
    )
    s_pad = ((len(tokens) + 127) // 128) * 128
    # 512-aligned capacity: the slot attention kernel's block width is
    # the largest of (512, 256, 128) dividing S_max, and it DMA-skips
    # past each row's length — so padding up buys 4x wider KV DMAs for
    # free (dead tail blocks are never read)
    max_len = min(engine.max_seq_len, ((s_pad + max_new + 511) // 512) * 512)
    del emb, probe

    # Moderate chunks: one harvest (~50ms fused device_get over the
    # tunnel) per chunk, but admissions between chunks keep slot
    # occupancy high while the prefill worker pipelines new pages.
    # measured best on v5e-1: full-slot prefill waves + 128-step chunks
    # (occupancy 8.0; decode is HBM-bound on expert streaming)
    chunk = int(os.environ.get("BENCH_CHUNK", "128"))
    prefill_batch = int(os.environ.get("BENCH_PREFILL_BATCH", str(n_slots))) or None

    def make_scheduler():
        return ContinuousScheduler(
            engine, tokenizer, n_slots=n_slots, max_len=max_len,
            chunk_steps=chunk, prefill_batch=prefill_batch,
        )

    scheduler = make_scheduler()

    async def serve_n(n):
        t0 = time.perf_counter()
        outs = await asyncio.gather(
            *(
                scheduler.submit("<image>\nFree OCR.", [image], settings, params)
                for _ in range(n)
            )
        )
        dt = time.perf_counter() - t0
        toks = sum(o.response_tokens for o in outs)
        return dt, toks

    # warmup/compile (joins + chunk + prefill bucket); a FULL-size wave
    # warms every shape the timed reps will hit (a 2-request warmup left
    # the wave-8 prefill bucket compiling inside the first timed rep).
    # Fallback ladder: a deterministic failure here (e.g. a Pallas
    # lowering error the CPU interpret path cannot catch) retries once
    # with the defaults (transient INVALID_ARGUMENT happens — CLAUDE.md),
    # then disables the fused slot-attention kernel + speculative chunk
    # dispatch and rebuilds the scheduler — a slower capture beats none.
    # 2 waves of `n_slots` hit every shape the timed reps will (wave
    # size, not total count, decides the shapes) — don't pay a full
    # 96-request pass just to warm
    n_warm = min(n_requests, 2 * n_slots)
    t_warm = time.perf_counter()
    for attempt in range(3):
        try:
            asyncio.run(serve_n(n_warm))
            break
        except Exception as err:
            if attempt >= 2:
                raise
            print(
                f"[bench] warmup failed ({type(err).__name__}: {err}); "
                + (
                    "retrying with defaults"
                    if attempt == 0
                    else "falling back to einsum slot attention + "
                    "synchronous chunk dispatch"
                ),
                file=sys.stderr,
            )
            if attempt == 1:
                os.environ["DSOCR_SLOT_ATTN_KERNEL"] = "0"
                os.environ["DSOCR_PIPELINE_CHUNKS"] = "0"
                # a fresh scheduler builds a fresh SlotRunner (new jit
                # identity), so the flag flips actually re-trace
                scheduler = make_scheduler()
    print(
        f"[bench] warmup done ({time.perf_counter() - t_warm:.0f}s)",
        file=sys.stderr,
    )

    profile_dir = os.environ.get("DSOCR_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    serve_times = []
    decode_tokens = 0
    best_stages = {}
    best_occ = 0.0
    debug = os.environ.get("BENCH_DEBUG")
    from dsocr_tpu.core.benchmark import BenchRecorder, set_recorder

    rep = 0
    retried = 0
    while rep < reps:
        scheduler.batch_sizes.clear()
        recorder = BenchRecorder()
        set_recorder(recorder)
        try:
            dt, toks = asyncio.run(serve_n(n_requests))
        except Exception as err:
            # sporadic `INVALID_ARGUMENT: TPU backend error` surfaces at
            # the next dispatch after an async failure and an identical
            # retry usually succeeds (CLAUDE.md) — don't lose the capture
            set_recorder(None)
            retried += 1
            if retried > 2:
                raise
            print(f"[bench] rep failed ({err}); retrying", file=sys.stderr)
            continue
        set_recorder(None)
        rep += 1
        occ = scheduler.batch_sizes
        mean_occ = sum(occ) / max(len(occ), 1)
        if not serve_times or dt < min(serve_times):
            best_stages = recorder.stage_totals()
            best_occ = mean_occ
        serve_times.append(dt)
        decode_tokens = toks
        if debug:
            print(
                f"[debug] rep: {dt:.2f}s, chunks={len(occ)}, "
                f"mean_occ={mean_occ:.2f}, occ={occ[:50]}",
                file=sys.stderr,
            )
            for stage, ms in sorted(recorder.stage_totals().items()):
                print(f"[debug]   {stage:24s} {ms:9.1f} ms", file=sys.stderr)
    if profile_dir:
        jax.profiler.stop_trace()
    best = min(serve_times)
    pages_per_sec = n_requests / best
    decode_tok_per_sec = decode_tokens / best

    result = {
        "metric": "deepseek_ocr_serving_pages_per_sec",
        "value": round(pages_per_sec, 4),
        "unit": (
            "pages/sec (TINY SMOKE MODE — random tiny config, numbers "
            "meaningless)"
            if tiny
            else f"pages/sec (continuous batching, {n_requests} reqs x "
            f"{n_slots} slots, 1024px crop mode, {max_new} new tokens, "
            f"{quant or 'bf16'}{f' + kv-{kv_quant}' if kv_quant else ''}, 1 chip)"
        ),
        "vs_baseline": round(pages_per_sec / BASELINE_PAGES_PER_SEC, 2),
        "decode_tok_per_sec": round(decode_tok_per_sec, 1),
        # attribution for regressions: host-side stage totals of the best
        # rep + mean slot occupancy + per-rep times (variance visibility)
        "mean_occupancy": round(best_occ, 2),
        "rep_times_s": [round(t, 2) for t in serve_times],
        "stage_ms": {k: round(v, 1) for k, v in sorted(best_stages.items())},
    }
    # the warmup fallback ladder (or the caller) disabled features —
    # make the degraded capture attributable
    off = [
        name
        for name, env in (
            ("slot-attn-kernel", "DSOCR_SLOT_ATTN_KERNEL"),
            ("pipeline-chunks", "DSOCR_PIPELINE_CHUNKS"),
        )
        if os.environ.get(env) == "0"
    ]
    if off:
        result["degraded"] = " + ".join(off) + " disabled"

    if os.environ.get("BENCH_BATCH1", "1") == "1":
        def run_single():
            t0 = time.perf_counter()
            engine.decode(
                tokenizer, "<image>\nFree OCR.", [image], settings, params
            )
            return time.perf_counter() - t0

        run_single()  # warm
        single = min(run_single() for _ in range(max(1, reps - 1)))
        result["batch1_pages_per_sec"] = round(1.0 / single, 4)
        result["batch1_latency_s"] = round(single, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
