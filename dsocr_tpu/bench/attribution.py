"""Isolated serving-stage attribution bench.

The serving pipeline's stage timers (bench.py stage_ms) measure WALL
time of threads sharing one device queue, so towers/prefill/decode
inflate each other and can't be attributed. This tool measures each
stage ALONE on the real chip:

  (a) one pooled tower+prefill wave of N pages (prefill_for_slots),
  (b) host-side preprocessing for N pages,
  (c) pure decode chunks at occupancy N (join N rows, run chunks),
  (d) the harvest device_get.

Run: python -m dsocr_tpu.bench.attribution  (env knobs below).
Timing rule for this machine: block_until_ready does not block over the
axon tunnel — every measurement syncs with a small np.asarray pull.

Env: ATTR_QUANT (q8_0|q4_k|q6_k|''), ATTR_KV_QUANT (int8|''),
ATTR_SLOTS (16), ATTR_MAXLEN (2560), ATTR_CHUNK (128), ATTR_IMAGE.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    os.environ.setdefault("DSOCR_INIT_CACHE", "/tmp/dsocr_init_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ..core import DecodeParameters, VisionSettings
    from ..models.deepseek import DeepseekOcrEngine
    from ..models.deepseek.config import DeepseekOcrConfig
    from .workload import BenchTokenizer, load_page_image

    quant = os.environ.get("ATTR_QUANT", "q8_0") or None
    kvq = os.environ.get("ATTR_KV_QUANT", "int8") or None
    n = int(os.environ.get("ATTR_SLOTS", "16"))
    maxlen = int(os.environ.get("ATTR_MAXLEN", "2560"))
    chunk = int(os.environ.get("ATTR_CHUNK", "128"))
    tiny = os.environ.get("ATTR_TINY") == "1"  # CPU smoke of the tool itself

    if not tiny:
        # wait out a wedged/down tunnel in-process (killing a probe
        # mid-device-op re-wedges it — see bench.probe)
        from .probe import probe_tunnel

        budget = float(os.environ.get("ATTR_PROBE_TIMEOUT", "3600"))
        print(f"probe ok ({probe_tunnel(budget, tag='attr'):.1f}s)", flush=True)

    t0 = time.perf_counter()
    if tiny:
        from ..models.deepseek.config import tiny_deepseek_config

        jax.config.update("jax_platforms", "cpu")
        engine = DeepseekOcrEngine(
            tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024,
            kv_quant=kvq,
        )
        maxlen, chunk = min(maxlen, 512), min(chunk, 8)
    else:
        engine = DeepseekOcrEngine(
            DeepseekOcrConfig(), dtype=jnp.bfloat16, max_seq_len=4096,
            quantize=quant, kv_quant=kvq,
        )
    print(f"engine init {time.perf_counter() - t0:.1f}s", flush=True)

    image = load_page_image("ATTR_IMAGE", tiny)
    settings = (
        VisionSettings(64, 64, False)
        if tiny
        else VisionSettings(base_size=1024, image_size=640, crop_mode=True)
    )
    params = DecodeParameters(max_new_tokens=512 if not tiny else 32)
    tok = BenchTokenizer()
    reqs = [("<image>\nFree OCR.", [image], settings)] * n

    # (a) pooled tower + prefill wave, isolated (first call compiles).
    # Sync rule: packet logits are host numpy already (the prefill path
    # pulled them), so the true device sync is ONE element of the LAST
    # row's KV — the device queue is in-order, so one pull covers the
    # whole wave (per-row pulls would add n x 30-400ms of tunnel
    # round-trips INSIDE the timed region).
    t0 = time.perf_counter()
    pres = engine.prefill_for_slots(tok, reqs)
    _ = np.asarray(pres[-1]["row_k"][0, 0, 0, 0, :1])
    warm = time.perf_counter() - t0
    from ..core.benchmark import BenchRecorder, set_recorder

    recorder = BenchRecorder()
    set_recorder(recorder)
    t0 = time.perf_counter()
    pres = engine.prefill_for_slots(tok, reqs)
    _ = np.asarray(pres[-1]["row_k"][0, 0, 0, 0, :1])
    wave_s = time.perf_counter() - t0
    set_recorder(None)
    print(
        f"tower+prefill wave of {n}: {wave_s:.2f}s "
        f"(warm incl compile {warm:.1f}s) -> {wave_s / n * 1000:.0f} ms/page",
        flush=True,
    )
    # Engine-internal stage split of the isolated wave. Caveat: the
    # vision_towers timer ends on a device sync, but prefill_rows only
    # DISPATCHES (its device time lands on the row_k pull above) — so
    # report prefill as the sync-to-sync remainder of the wave.
    stages = recorder.stage_totals()
    towers_ms = stages.get("slot.vision_towers", 0.0)
    prep_ms = stages.get("slot.prepare_inputs", 0.0)
    rest_ms = wave_s * 1000 - towers_ms - prep_ms
    print(
        f"  wave split: prepare(host) {prep_ms:.0f} ms, "
        f"upload+towers(sync) {towers_ms:.0f} ms, "
        f"prefill remainder {rest_ms:.0f} ms "
        f"({towers_ms / n:.0f} / {rest_ms / n:.0f} ms/page)",
        flush=True,
    )
    # Upload-only: ship the wave's pixels again and sync — bounds how
    # much of the tower stage is tunnel transfer rather than compute.
    vins = [
        engine.prepare_vision_input(np.asarray(image), settings)
        for _ in range(n)
    ]
    pix = [v.global_pixels for v in vins] + [
        v.patches for v in vins if v.patches is not None
    ]
    t0 = time.perf_counter()
    bufs = [jax.device_put(p) for p in pix]
    for b in bufs:
        b.block_until_ready()
    _ = np.asarray(bufs[-1][0, 0, 0, :1])  # tunnel-honest sync
    up_s = time.perf_counter() - t0
    nbytes = sum(p.nbytes for p in pix)
    print(
        f"pixel upload only: {nbytes / 1e6:.0f} MB in {up_s:.2f}s "
        f"({nbytes / up_s / 1e6:.0f} MB/s, {up_s / n * 1000:.0f} ms/page)",
        flush=True,
    )
    # sparse-coded sizes (what serving actually ships, r5): encode the
    # same tile stacks host-side and report the byte cut
    try:
        from ..image.sparse_code import encode_views

        t0 = time.perf_counter()
        coded = sum(
            (sp.nbytes if (sp := encode_views(np.asarray(p))) else p.nbytes)
            for p in pix
        )
        enc_s = time.perf_counter() - t0
        print(
            f"sparse-coded upload would be: {coded / 1e6:.0f} MB "
            f"({coded / max(nbytes, 1):.2f}x of raw; host encode "
            f"{enc_s:.2f}s)",
            flush=True,
        )
    except Exception as err:
        print(f"sparse-coding probe failed: {err}", flush=True)

    # (b) host-only preprocessing
    t0 = time.perf_counter()
    for _ in range(n):
        engine.prepare_vision_input(image, settings)
    print(
        f"host prepare_vision_input x{n}: {time.perf_counter() - t0:.2f}s",
        flush=True,
    )

    # (c) pure decode chunks at occupancy n
    runner = engine.make_slot_runner()
    cache = engine.new_slot_cache(n, maxlen)
    state = runner.init_state(cache, context_len=maxlen)
    plen = len(pres[0]["prompt_ids"])
    budget = min(512 if not tiny else 32, maxlen - plen)
    # (c0) wave first-token selection + per-row joins, timed — the
    # scheduler serializes joins with decode chunks, so per-join dispatch
    # latency (~20ms tunnel) x wave size is a real serving cost
    t0 = time.perf_counter()
    firsts = runner.select_first_tokens(pres, [params] * n, pad_to=n)
    sel_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(n):
        pre = pres[r]
        state, _, _ = runner.join(
            state, r, pre["row_k"], pre["row_v"], pre["prompt_ids"],
            pre["logits"], params, budget, pos0=pre["pos0"],
            first=firsts[r],
        )
    _ = np.asarray(state.ctx_len)
    join_s = time.perf_counter() - t0
    print(
        f"joined {n} rows in {join_s:.2f}s ({join_s / n * 1000:.0f} ms/row; "
        f"first-token wave select {sel_s * 1000:.0f} ms), "
        f"prompt_len={plen}, budget={budget}",
        flush=True,
    )

    t0 = time.perf_counter()
    state, snap = runner.run_chunk_snap(engine.params, state, chunk)
    _ = np.asarray(snap[:, -1])
    warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, snap = runner.run_chunk_snap(engine.params, state, chunk)
        _ = np.asarray(snap[:, -1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"decode chunk {chunk} steps @ {n} rows (maxlen {maxlen}): "
        f"{best * 1000:.0f} ms -> {best / chunk * 1000:.2f} ms/step "
        f"(warm {warm:.1f}s, all {[f'{t:.2f}' for t in times]})",
        flush=True,
    )

    # (d) harvest transfer
    t0 = time.perf_counter()
    runner.harvest_from_snap(snap)
    print(f"harvest: {(time.perf_counter() - t0) * 1000:.0f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
