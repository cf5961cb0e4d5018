"""Interleaved A/B: 16 vs 32 slots at 96 requests, ONE process.

The earlier 64req x 32slot sweep (1.36 pages/sec) was only 2 admission
waves — the same degenerate tail shape that made 32req x 16slot look
slow (1.99 vs the 2.7 marginal rate). At 32 rows the decode step is
~11ms → 0.34 ms/token vs 16-row's 0.50; if towers for wave N+1 fit
under wave N's longer decode (uploads 32x3MB ≈ 2.2s, host prep ≈ 2.4s,
tower kernels ≈ 1s vs ~5.8s decode), 96x32 should beat 96x16.
Interleaved reps with per-arm schedulers cancel tunnel phase drift;
stage totals print per rep so the tower-wall hypothesis is checkable.
"""
import asyncio
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("DSOCR_INIT_CACHE", "/tmp/dsocr_init_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from dsocr_tpu.bench.probe import probe_tunnel
from dsocr_tpu.bench.workload import BenchTokenizer, load_page_image
from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.core.benchmark import BenchRecorder, set_recorder
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig
from dsocr_tpu.server.scheduler import ContinuousScheduler

probe_s = probe_tunnel(3600.0, tag="slots96")
print(f"probe ok {probe_s:.1f}s", flush=True)

engine = DeepseekOcrEngine(
    DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096,
    quantize="q8_0", kv_quant="int8",
)
image = load_page_image("BENCH_IMAGE", False)
settings = VisionSettings(base_size=1024, image_size=640, crop_mode=True)
params = DecodeParameters(max_new_tokens=512)
tokenizer = BenchTokenizer()

probe_v = engine.prepare_vision_input(image, settings)
emb = engine.compute_image_embedding(probe_v)
tokens, _ = engine.build_prompt_tokens(
    tokenizer, "<image>\nFree OCR.", [probe_v], [emb], settings
)
s_pad = ((len(tokens) + 127) // 128) * 128
max_len = min(engine.max_seq_len, ((s_pad + 512 + 511) // 512) * 512)
del emb, probe_v

scheds = {
    n: ContinuousScheduler(
        engine, tokenizer, n_slots=n, max_len=max_len,
        chunk_steps=128, prefill_batch=n,
    )
    for n in (16, 32)
}


async def serve_n(sched, n):
    t0 = time.perf_counter()
    outs = await asyncio.gather(
        *(
            sched.submit("<image>\nFree OCR.", [image], settings, params)
            for _ in range(n)
        )
    )
    dt = time.perf_counter() - t0
    toks = sum(o.response_tokens for o in outs)
    return dt, toks


for slots, sched in scheds.items():
    t0 = time.perf_counter()
    asyncio.run(serve_n(sched, 2 * slots))
    print(f"warmup slots={slots} {time.perf_counter()-t0:.0f}s", flush=True)

N = int(os.environ.get("AB_REQS", "96"))
for rep in range(2):
    for slots, sched in scheds.items():
        rec = BenchRecorder()
        set_recorder(rec)
        try:
            dt, toks = asyncio.run(serve_n(sched, N))
        finally:
            set_recorder(None)
        print(
            f"slots={slots:2d}: {dt:6.2f}s  {N/dt:.3f} pages/sec  "
            f"{toks/dt:.0f} tok/s",
            flush=True,
        )
        for stage, ms in sorted(rec.stage_totals().items()):
            print(f"    {stage:28s} {ms:9.1f} ms", flush=True)
