"""Interleaved same-process A/B: DSOCR_FIRST_WAVE=0 (off) vs 4 at
96 requests x 16 slots, q8_0 + int8 KV.

r4 attribution: the FIRST admission wave of a cold pipeline is fully
serial (~7 s of prepare/upload/towers/prefill with no decode to
overlap). A 4-page first wave starts decode ~5 s earlier; subsequent
full-size waves overlap it. The ramp re-arms when the pipeline drains,
and the env is read at scheduler construction — so each config uses its
own scheduler (same engine/jits)."""

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("DSOCR_INIT_CACHE", "/tmp/dsocr_init_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from dsocr_tpu.bench.probe import probe_tunnel
from dsocr_tpu.bench.workload import BenchTokenizer, load_page_image
from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig
from dsocr_tpu.server.scheduler import ContinuousScheduler

REQS = int(os.environ.get("SWEEP_REQUESTS", "96"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CONFIGS = [("ramp0", "0"), ("ramp4", "4")]


def main():
    print(f"[sweep] probe: {probe_tunnel(3600, tag='sweep'):.1f}s", flush=True)
    t0 = time.perf_counter()
    engine = DeepseekOcrEngine(
        DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096,
        quantize="q8_0", kv_quant="int8",
    )
    print(f"[sweep] engine ready ({time.perf_counter() - t0:.0f}s)", flush=True)
    image = load_page_image("BENCH_IMAGE", False)
    settings = VisionSettings(base_size=1024, image_size=640, crop_mode=True)
    params = DecodeParameters(max_new_tokens=512)
    tokenizer = BenchTokenizer()
    vin = engine.prepare_vision_input(image, settings)
    emb = engine.compute_image_embedding(vin)
    tokens, _ = engine.build_prompt_tokens(
        tokenizer, "<image>\nFree OCR.", [vin], [emb], settings
    )
    s_pad = ((len(tokens) + 127) // 128) * 128
    max_len = min(engine.max_seq_len, ((s_pad + 512 + 511) // 512) * 512)
    del vin, emb

    scheds = {}
    for label, val in CONFIGS:
        os.environ["DSOCR_FIRST_WAVE"] = val
        scheds[label] = ContinuousScheduler(
            engine, tokenizer, n_slots=16, max_len=max_len,
            chunk_steps=128, prefill_batch=16,
        )
    os.environ.pop("DSOCR_FIRST_WAVE", None)

    async def serve(sched, n):
        t0 = time.perf_counter()
        outs = await asyncio.gather(
            *(sched.submit("<image>\nFree OCR.", [image], settings, params)
              for _ in range(n))
        )
        dt = time.perf_counter() - t0
        ttft = sorted(sched.ttft_samples)
        sched.ttft_samples.clear()
        return dt, ttft[len(ttft) // 2] if ttft else 0.0

    # warm: ramp4 compiles the B=4 prefill bucket + 4-view tower chunk
    for label in ("ramp0", "ramp4"):
        t0 = time.perf_counter()
        asyncio.run(serve(scheds[label], 32))
        print(f"[sweep] warm {label}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {label: [] for label, _ in CONFIGS}
    for rep in range(REPS):
        for label, _ in CONFIGS:
            dt = None
            for attempt in range(3):
                try:
                    dt, ttft_p50 = asyncio.run(serve(scheds[label], REQS))
                    break
                except Exception as err:
                    print(f"[sweep] {label} rep failed ({err}); retry", flush=True)
            if dt is None:
                continue
            results[label].append(dt)
            print(
                f"[sweep] rep{rep} {label}: {dt:.2f}s ({REQS/dt:.3f} pages/s, "
                f"ttft_p50 {ttft_p50:.2f}s)",
                flush=True,
            )
    for label, times in results.items():
        if times:
            print(f"[sweep] BEST {label}: {REQS/min(times):.4f} pages/s "
                  f"(all {[round(t,2) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
