"""Interleaved A/B: streamed wave prep + content-only global upload.

Arms (same process, alternating — tunnel drift makes cross-process
comparisons meaningless):
  off : DSOCR_STREAM_PREP=0 DSOCR_CONTENT_UPLOAD=0 (r3 sequential path)
  on  : DSOCR_STREAM_PREP=1 DSOCR_CONTENT_UPLOAD=1 (new default)

Hypothesis: the 16-page wave chain is upload-bound (~4.6s of pixel
bytes at 43 MB/s) with host prep (~1.2s) serialized in front. Streaming
hides prep under the uploads and the content slice cuts the global view
bytes ~38% (this page is 1756x2852 → 630 content rows of 1024) →
chain ~6.4s → ~4.4s, decode 4.1s stays hidden → ~+25-35% pages/sec.
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

probe_s = probe_tunnel(3600.0, tag="stream_ab")
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
print(f"global_pad={probe_v.global_pad} tiles="
      f"{None if probe_v.patches is None else probe_v.patches.shape}",
      flush=True)
del emb, probe_v

scheduler = ContinuousScheduler(
    engine, tokenizer, n_slots=16, max_len=max_len,
    chunk_steps=128, prefill_batch=16,
)

ARMS = {
    "off": {"DSOCR_STREAM_PREP": "0", "DSOCR_CONTENT_UPLOAD": "0"},
    "on": {"DSOCR_STREAM_PREP": "1", "DSOCR_CONTENT_UPLOAD": "1"},
}


def set_arm(name):
    os.environ.update(ARMS[name])


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


# warm BOTH arms' compiled shapes (content upload adds a content-shaped
# tower graph) with full-slot waves
for arm in ("off", "on"):
    set_arm(arm)
    t0 = time.perf_counter()
    asyncio.run(serve_n(32))
    print(f"warmup[{arm}] {time.perf_counter()-t0:.0f}s", flush=True)

for rep in range(2):
    for arm in ("off", "on"):
        set_arm(arm)
        dt, toks = asyncio.run(serve_n(64))
        print(
            f"rep{rep} {arm:3s}: {dt:6.2f}s  {64/dt:.3f} pages/sec  "
            f"{toks/dt:.0f} tok/s",
            flush=True,
        )
