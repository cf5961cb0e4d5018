"""Interleaved same-process serving A/B: chunk 128 (default) vs 256, at
96 requests x 16 slots, q8_0 + int8 KV.

Rationale (r4): at 96 requests the rep spends ~2.2 s per 128-step chunk
(~17 ms/step wall) while the kernel-time step is ~8 ms — the gap is
queue contention with tower/upload work plus one harvest round trip per
chunk. Chunk 256 halves the harvest count and halves the number of
chunk-boundary admissions (all rows run exactly 512 steps, so coarser
boundaries do not strand finished rows). Interleaved A/B per CLAUDE.md:
tunnel phase drift is ±40% across hours, so only same-process
alternation is trustworthy for <2x effects.

Usage: python bench_logs/r4/sweep_chunk_slots.py [reps_per_config]
"""

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

MAX_NEW = int(os.environ.get("SWEEP_MAX_NEW", "512"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
# (label, n_slots, chunk, n_requests): r3's request sweep measured 96 >
# 32 (waves amortize the first wave's unoverlapped prepare; marginal
# steady-state ~2.7 pages/s) — 192 probes further down that asymptote.
CONFIGS = [
    ("c128_r96", 16, 128, 96),
    ("c256_r96", 16, 256, 96),
    ("c128_r192", 16, 128, 192),
]


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
    params = DecodeParameters(max_new_tokens=MAX_NEW)
    tokenizer = BenchTokenizer()

    vin = engine.prepare_vision_input(image, settings)
    emb = engine.compute_image_embedding(vin)
    tokens, _ = engine.build_prompt_tokens(
        tokenizer, "<image>\nFree OCR.", [vin], [emb], settings
    )
    s_pad = ((len(tokens) + 127) // 128) * 128
    max_len = min(engine.max_seq_len, ((s_pad + MAX_NEW + 511) // 512) * 512)
    del vin, emb

    scheds = {}
    for label, slots, chunk, _reqs in CONFIGS:
        key = (slots, chunk)
        if key not in scheds:
            scheds[key] = ContinuousScheduler(
                engine, tokenizer, n_slots=slots, max_len=max_len,
                chunk_steps=chunk, prefill_batch=slots,
            )

    async def serve(sched, n):
        t0 = time.perf_counter()
        outs = await asyncio.gather(
            *(sched.submit("<image>\nFree OCR.", [image], settings, params)
              for _ in range(n))
        )
        dt = time.perf_counter() - t0
        return dt, sum(o.response_tokens for o in outs)

    # warm every scheduler (compiles) with a 2-wave pass
    for (slots, chunk), sched in scheds.items():
        t0 = time.perf_counter()
        asyncio.run(serve(sched, 2 * slots))
        print(f"[sweep] warm c{chunk}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {label: [] for label, _, _, _ in CONFIGS}
    for rep in range(REPS):
        for label, slots, chunk, reqs in CONFIGS:
            dt = toks = None
            for attempt in range(3):
                try:
                    dt, toks = asyncio.run(serve(scheds[(slots, chunk)], reqs))
                    break
                except Exception as err:
                    print(f"[sweep] {label} rep failed ({err}); retry", flush=True)
            if dt is None:
                print(f"[sweep] {label} rep abandoned after 3 failures", flush=True)
                continue
            results[label].append((dt, reqs))
            print(
                f"[sweep] rep{rep} {label}: {dt:.2f}s "
                f"({reqs / dt:.3f} pages/s, {toks / dt:.0f} tok/s)",
                flush=True,
            )
    for label, times in results.items():
        if not times:
            print(f"[sweep] BEST {label}: no completed reps", flush=True)
            continue
        best = min(t / r for t, r in times)
        print(
            f"[sweep] BEST {label}: {1.0 / best:.4f} pages/s "
            f"(reps: {[(round(t, 2), r) for t, r in times]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
