"""Headline bench: DeepSeek-OCR (3B MoE decoder + SAM/CLIP towers, bf16)
single-page OCR throughput on one TPU chip.

Workload mirrors the reference's README benchmark (BASELINE.md): one
~1024px document page, crop mode, 512 new tokens, greedy with
no_repeat_ngram=20 — the reference's Accelerate-CPU number is ~30.1 s
per page (~0.0333 pages/sec). Weights are random-init (no weights ship
with this machine); FLOPs and memory traffic are identical to real
weights, so throughput is representative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np

BASELINE_PAGES_PER_SEC = 1.0 / 30.078  # reference decode.generate, README.md:155


class BenchTokenizer:
    def encode(self, text):
        return [(ord(c) * 7 + 13) % 120000 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)

    def token_to_id(self, token):
        return 128815 if token == "<image>" else None


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig

    max_new = int(os.environ.get("BENCH_MAX_NEW_TOKENS", "512"))
    engine = DeepseekOcrEngine(
        DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096
    )
    image_path = os.environ.get(
        "BENCH_IMAGE", "/root/reference/assets/sample_1.png"
    )
    if os.path.exists(image_path):
        image = np.asarray(Image.open(image_path).convert("RGB"))
    else:
        image = np.random.default_rng(0).integers(
            0, 256, size=(1756, 2852, 3), dtype=np.uint8
        )

    settings = VisionSettings(base_size=1024, image_size=640, crop_mode=True)
    params = DecodeParameters(max_new_tokens=max_new)  # greedy, ngram=20 defaults

    batch = int(os.environ.get("BENCH_BATCH", "1"))

    def run_once():
        t0 = time.perf_counter()
        if batch > 1:
            outs = engine.decode_batch(
                BenchTokenizer(),
                ["<image>\nFree OCR."] * batch,
                [[image]] * batch,
                settings,
                params,
            )
            out = outs[0]
        else:
            out = engine.decode(
                BenchTokenizer(), "<image>\nFree OCR.", [image], settings, params
            )
        return time.perf_counter() - t0, out

    # warmup/compile
    run_once()
    profile_dir = os.environ.get("DSOCR_PROFILE_DIR")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    times = []
    for _ in range(int(os.environ.get("BENCH_REPS", "2"))):
        dt, out = run_once()
        times.append(dt)
    if profile_dir:
        jax.profiler.stop_trace()
    best = min(times)
    pages_per_sec = batch / best
    print(
        json.dumps(
            {
                "metric": "deepseek_ocr_pages_per_sec",
                "value": round(pages_per_sec, 4),
                "unit": "pages/sec (1024px page, crop mode, 512 new tokens, bf16, 1 chip)",
                "vs_baseline": round(pages_per_sec / BASELINE_PAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
