"""Interleaved serving A/B: DSOCR_Q8_MEGAFUSED on/off in ONE process.

The kernel microbench ties (4.879 vs 4.881 ms/step, 609 GB/s both) but
production's two-kernel path additionally pays the [E,N,H] transpose +
take_along_axis combine (~12 MB/layer) that the fused kernel folds into
its accumulation — serving is the decider. The flag is read at trace
time, so each arm gets its OWN scheduler (fresh SlotRunner jit
identity); reps interleave to cancel tunnel phase drift.
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

probe_s = probe_tunnel(3600.0, tag="megafused-ab")
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


def make_sched(flag):
    os.environ["DSOCR_Q8_MEGAFUSED"] = flag
    return ContinuousScheduler(
        engine, tokenizer, n_slots=16, max_len=max_len,
        chunk_steps=128, prefill_batch=16,
    )


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


N = int(os.environ.get("AB_REQS", "64"))
for flag in ("0", "1"):
    os.environ["DSOCR_Q8_MEGAFUSED"] = flag
    sched = make_sched(flag)
    t0 = time.perf_counter()
    asyncio.run(serve_n(sched, 32))
    print(f"warmup flag={flag} {time.perf_counter()-t0:.0f}s", flush=True)
    globals()[f"sched_{flag}"] = sched

for rep in range(2):
    for flag in ("0", "1"):
        os.environ["DSOCR_Q8_MEGAFUSED"] = flag  # belt: traced already
        sched = globals()[f"sched_{flag}"]
        dt, toks = asyncio.run(serve_n(sched, N))
        print(
            f"megafused={flag}: {dt:6.2f}s  {N/dt:.3f} pages/sec  "
            f"{toks/dt:.0f} tok/s",
            flush=True,
        )
