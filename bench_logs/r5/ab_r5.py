"""r5 interleaved A/B: sparse upload on/off x slot count, one process.

Tunnel phase drift is +/-40% across hours (CLAUDE.md), so only
same-process interleaved comparisons are meaningful. Each rep serves
N_REQ requests through a fresh-state ContinuousScheduler on the shared
q8_0+int8 engine; configs rotate A,B,C,A,B,C,...

Usage: python bench_logs/r5/ab_r5.py [rounds]
Env: AB_REQUESTS (default 32), AB_ROUNDS (2), AB_CONFIGS (comma list of
name:slots:prefill:sparse tuples; default the r5 question set).
"""

import asyncio
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("DSOCR_INIT_CACHE", "/tmp/dsocr_init_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    from dsocr_tpu.bench.probe import probe_tunnel
    from dsocr_tpu.bench.workload import BenchTokenizer, load_page_image
    from dsocr_tpu.core import DecodeParameters, VisionSettings
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.config import DeepseekOcrConfig
    from dsocr_tpu.server.scheduler import ContinuousScheduler

    n_req = int(os.environ.get("AB_REQUESTS", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    max_new = int(os.environ.get("AB_MAX_NEW", "512"))
    cfg_spec = os.environ.get(
        "AB_CONFIGS",
        "sp1_s16:16:16:1,sp0_s16:16:16:0,sp1_s24:24:16:1",
    )
    configs = []
    for part in cfg_spec.split(","):
        fields = part.split(":")
        name, slots, prefill, sparse = fields[:4]
        batch_join = fields[4] if len(fields) > 4 else "1"
        quant = fields[5] if len(fields) > 5 else "q8_0"
        extra = fields[6] if len(fields) > 6 else ""  # "K=V;K=V"
        configs.append(
            (name, int(slots), int(prefill), sparse, batch_join, quant, extra)
        )

    print(f"[ab] probe...", flush=True)
    t = probe_tunnel(3000.0, tag="ab_r5")
    print(f"[ab] probe ok {t:.1f}s", flush=True)

    engines = {}

    def get_engine(quant):
        if quant not in engines:
            t0 = time.perf_counter()
            engines[quant] = DeepseekOcrEngine(
                DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096,
                quantize=quant, kv_quant="int8",
            )
            print(
                f"[ab] engine[{quant}] ready {time.perf_counter()-t0:.0f}s",
                flush=True,
            )
        return engines[quant]

    engine = get_engine(configs[0][5])
    image = load_page_image("BENCH_IMAGE", False)
    settings = VisionSettings(base_size=1024, image_size=640, crop_mode=True)
    params = DecodeParameters(max_new_tokens=max_new)
    tok = BenchTokenizer()

    probe_vin = engine.prepare_vision_input(image, settings)
    emb = engine.compute_image_embedding(probe_vin)
    tokens, _ = engine.build_prompt_tokens(
        tok, "<image>\nFree OCR.", [probe_vin], [emb], settings
    )
    s_pad = ((len(tokens) + 127) // 128) * 128
    max_len = min(engine.max_seq_len, ((s_pad + max_new + 511) // 512) * 512)
    del emb, probe_vin

    def run_rep(name, slots, prefill, sparse, n, batch_join="1", quant="q8_0",
                extra=""):
        os.environ["DSOCR_SPARSE_UPLOAD"] = sparse
        os.environ["DSOCR_BATCH_JOIN"] = batch_join
        for kv in extra.split(";"):
            if "=" in kv:
                k, v = kv.split("=", 1)
                os.environ[k] = v
        sched = ContinuousScheduler(
            get_engine(quant), tok, n_slots=slots, max_len=max_len,
            chunk_steps=128, prefill_batch=prefill,
        )

        async def serve():
            t0 = time.perf_counter()
            outs = await asyncio.gather(*(
                sched.submit("<image>\nFree OCR.", [image], settings, params)
                for _ in range(n)
            ))
            dt = time.perf_counter() - t0
            return dt, sum(o.response_tokens for o in outs)

        dt, toks = asyncio.run(serve())
        occ = sched.batch_sizes
        mean_occ = sum(occ) / max(1, len(occ))
        ttft = sorted(sched.ttft_samples)
        p50 = ttft[len(ttft) // 2] if ttft else 0.0
        p95 = ttft[int(len(ttft) * 0.95)] if ttft else 0.0
        # free the slot state's HBM before the next config's state builds
        sched._state = None
        sched._runner = None
        del sched
        gc.collect()
        rec = dict(
            config=name, n=n, wall_s=round(dt, 2),
            pages_per_sec=round(n / dt, 4),
            tok_per_sec=round(toks / dt, 1),
            mean_occ=round(mean_occ, 2),
            ttft_p50=round(p50, 2), ttft_p95=round(p95, 2),
        )
        print(json.dumps(rec), flush=True)
        return rec

    # warmup each config once (compiles: 24-row chunk, sparse decode jits)
    for name, slots, prefill, sparse, bj, q, ex in configs:
        t0 = time.perf_counter()
        run_rep(
            "warm_" + name, slots, prefill, sparse, min(n_req, 2 * slots),
            bj, q, ex,
        )
        print(f"[ab] warm {name} {time.perf_counter()-t0:.0f}s", flush=True)

    results = {}
    for r in range(rounds):
        for name, slots, prefill, sparse, bj, q, ex in configs:
            rec = run_rep(name, slots, prefill, sparse, n_req, bj, q, ex)
            results.setdefault(name, []).append(rec["pages_per_sec"])
    print(json.dumps({"summary": {k: v for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
