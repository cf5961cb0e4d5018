"""Interleaved A/B: request-count sweep (32 vs 96) in ONE process.

Tunnel phase drift is +-40% across hours, so only same-process
interleaved reps are trustworthy (CLAUDE.md). Hypothesis from the 2.02
pages/sec rep structure: rep wall ~= wave-1 prepare (~6s, unoverlapped)
+ decode; more waves amortize the exposed first prepare, so 96 requests
should land ~2.5-2.9 pages/sec if steady-state prep/decode overlap holds.
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
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig
from dsocr_tpu.server.scheduler import ContinuousScheduler

probe_s = probe_tunnel(3600.0, tag="sweep96")
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

scheduler = ContinuousScheduler(
    engine, tokenizer, n_slots=16, max_len=max_len,
    chunk_steps=128, prefill_batch=16,
)


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


t0 = time.perf_counter()
asyncio.run(serve_n(32))
print(f"warmup done {time.perf_counter()-t0:.0f}s", flush=True)

for n in (32, 96, 32, 96):
    dt, toks = asyncio.run(serve_n(n))
    print(
        f"n={n:3d}: {dt:6.2f}s  {n/dt:.3f} pages/sec  {toks/dt:.0f} tok/s",
        flush=True,
    )
