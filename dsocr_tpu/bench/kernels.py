"""Decode-attention kernel microbench (promoted from the r3 scratch
harness that found the aliased-write win).

Times the per-layer slot decode attention chain at serving geometry —
`lax.scan` over layers inside `lax.scan` over steps inside ONE jit, so
the tunnel's ~20ms dispatch and ~3.4ms/iteration sequential-step floor
are paid once per variant, not per op (see CLAUDE.md timing notes).

Variants:
  kernel-ro    slot_decode_attention only (no cache writes)
  kernel-rw    XLA scatter write + kernel attend — demonstrates the
               copy-per-layer trap the aliased kernel exists to fix
  einsum-ro    attention_kv_int8 full-row einsum (the fallback path)
  integrated   slot_kv_write_attend: aliased Pallas write + attend,
               the production decode path (ops/attention.py:190)

MoE variants (--suite moe) time the dense all-expert Q8 decode kernels
at serving geometry with both scale-expansion modes (DSOCR_Q8_EXPAND):
  moe-fast     broadcast+reshape expansion (exact, default)
  moe-matmul   the 0/1 f32 expansion matmul it replaced (r3: measured
               ~2x the kernel time AND bf16-rounded the scales on TPU)

Usage: python -m dsocr_tpu.bench.kernels [--steps 32] [--rows 16]
       [--ctx 2560] [--layers 12] [--variants integrated,einsum-ro]
       [--suite attn|moe]

Numbers print per-call (per layer) and per-step (all layers); the
production step also pays projections/MoE, so compare variants against
each other, not against end-to-end step time.
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def _bench(name, fn, args, steps, layers, reps):
    f = jax.jit(fn)
    t = time.perf_counter()
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    warm = time.perf_counter() - t
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        times.append(time.perf_counter() - t)
    best = min(times)
    print(
        f"{name:22s}: {best * 1000:8.1f} ms total -> "
        f"{best * 1000 / steps / layers:7.3f} ms/call "
        f"({best * 1000 / steps:6.2f} ms/step) warm {warm:.1f}s",
        flush=True,
    )


def _moe_suite(args) -> int:
    """Dense all-expert Q8 MoE chain (gate+up -> silu -> down) at
    serving geometry, expansion-mode A/B. Weights ride as jit ARGS —
    closure-captured GB-scale constants choke the remote compiler."""
    from ..ops.pallas.dequant_matmul import (
        q8_dense_experts_layered,
        q8_dense_experts_perx_layered,
    )

    L, E, H, MI, N = (args.layers, args.experts, args.hidden,
                      args.moe_inter, args.rows)
    rng = np.random.default_rng(0)

    def scales(*shape):
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.02)
            .astype(np.float16).astype(np.float32)
        )

    gu_c = jnp.asarray(rng.integers(-127, 128, (L, E, H, 2 * MI), dtype=np.int8))
    gu_s = scales(L, E, H // 32, 2 * MI)
    dn_c = jnp.asarray(rng.integers(-127, 128, (L, E, MI, H), dtype=np.int8))
    dn_s = scales(L, E, MI // 32, H)
    x0 = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    layers = jnp.arange(L, dtype=jnp.int32)
    gb = (gu_c.size + dn_c.size) / 1e9 + (gu_s.size + dn_s.size) * 4 / 1e9

    interp = jax.default_backend() != "tpu"

    def make(mode):
        def loop(x0, gu_c, gu_s, dn_c, dn_s):
            def step(x, _):
                def layer(xc, li):
                    gu = q8_dense_experts_layered(
                        xc, gu_c, gu_s, li, expand=mode, interpret=interp,
                        tile=args.tile_gu)
                    hdn = (jax.nn.silu(gu[..., :MI]) * gu[..., MI:]).astype(
                        jnp.bfloat16)
                    dn = q8_dense_experts_perx_layered(
                        hdn, dn_c, dn_s, li, expand=mode,
                        interpret=interp, tile=args.tile_dn)
                    return (xc + 0.01 * dn.mean(axis=0)).astype(jnp.bfloat16), None

                x, _ = jax.lax.scan(layer, x, layers)
                return x, None

            x, _ = jax.lax.scan(step, x0, None, length=args.steps)
            return x

        return loop

    def make_megafused():
        from ..ops.pallas.dequant_matmul import q8_moe_megafused_layered

        # dense routing weights: 6 of 64 experts per row, like serving
        w_np = np.zeros((E, N), np.float32)
        for r in range(N):
            sel = rng.choice(E, size=min(6, E), replace=False)
            w_np[sel, r] = rng.random(len(sel))
        w_dense = jnp.asarray(w_np)

        def loop(x0, gu_c, gu_s, dn_c, dn_s):
            def step(x, _):
                def layer(xc, li):
                    out = q8_moe_megafused_layered(
                        xc.astype(jnp.bfloat16), w_dense, gu_c, gu_s,
                        dn_c, dn_s, li, interpret=interp,
                        gu_chunk=args.tile_gu or 256,
                        dn_chunk=args.tile_dn or 640,
                    )
                    return (xc + 0.01 * out).astype(jnp.bfloat16), None

                x, _ = jax.lax.scan(layer, x, layers)
                return x, None

            x, _ = jax.lax.scan(step, x0, None, length=args.steps)
            return x

        return loop

    # moe-bf16deq: all-bf16 dequant (one fewer VPU pass per weight);
    # moe-noscale: numerics-WRONG ceiling probe (stream+convert+matmul
    # only) — if it matches moe-fast the kernel is DMA/HBM-bound and no
    # dequant cut can help; if it is much faster, the VPU is the wall.
    modes = {"moe-fast": "fast", "moe-matmul": "matmul",
             "moe-bf16deq": "bf16", "moe-noscale": "none"}
    wanted = [v.strip() for v in args.variants.split(",")]
    for name in wanted:
        if name not in modes and name != "moe-megafused":
            continue
        if name == "moe-megafused":
            f = jax.jit(make_megafused())
        else:
            f = jax.jit(make(modes[name]))
        t = time.perf_counter()
        np.asarray(f(x0, gu_c, gu_s, dn_c, dn_s))
        warm = time.perf_counter() - t
        times = []
        for _ in range(args.reps):
            t = time.perf_counter()
            np.asarray(f(x0, gu_c, gu_s, dn_c, dn_s))
            times.append(time.perf_counter() - t)
        best = min(times)
        ms = best * 1000 / args.steps
        print(
            f"{name:22s}: {ms:7.3f} ms/step "
            f"({gb / (best / args.steps):6.1f} GB/s streamed) warm {warm:.1f}s",
            flush=True,
        )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--suite", default="attn", choices=("attn", "moe"))
    ap.add_argument(
        "--device", default=None, choices=(None, "cpu", "tpu"),
        help="force a platform (config update must precede any device op)",
    )
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--experts", type=int, default=64)
    ap.add_argument("--tile-gu", type=int, default=0, help="moe gate+up out tile")
    ap.add_argument("--tile-dn", type=int, default=0, help="moe down out tile")
    ap.add_argument("--hidden", type=int, default=1280)
    ap.add_argument("--moe-inter", type=int, default=896)
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=2560)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--kv-heads", type=int, default=10)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variants",
        default="kernel-ro,kernel-rw,einsum-ro,integrated",
        help="comma list from kernel-ro,kernel-rw,einsum-ro,integrated",
    )
    args = ap.parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)

    if args.suite == "moe":
        if args.variants == "kernel-ro,kernel-rw,einsum-ro,integrated":
            args.variants = "moe-fast,moe-megafused"
        if jax.default_backend() != "cpu":
            from .probe import probe_tunnel

            dt = probe_tunnel(3600.0, tag="kernels")
            print(f"probe ok in {dt:.1f}s backend={jax.default_backend()}",
                  flush=True)
        else:
            t = time.perf_counter()
            np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
            print(f"probe ok in {time.perf_counter() - t:.1f}s "
                  f"backend={jax.default_backend()}", flush=True)
        return _moe_suite(args)

    from ..ops.attention import attention_kv_int8, slot_kv_write_attend
    from ..ops.pallas.slot_attention import slot_decode_attention

    L, B, NKV, S, D = args.layers, args.rows, args.kv_heads, args.ctx, args.head_dim
    NH = NKV  # deepseek GQA group size 1 at the real geometry
    STEPS = args.steps
    rng = np.random.default_rng(0)
    k_all = jnp.asarray(rng.integers(-127, 127, (L, B, NKV, S, D), dtype=np.int8))
    v_all = jnp.asarray(rng.integers(-127, 127, (L, B, NKV, S, D), dtype=np.int8))
    ks = jnp.asarray(rng.standard_normal((L, B, NKV, S), dtype=np.float32) * 0.01)
    vs = jnp.asarray(rng.standard_normal((L, B, NKV, S), dtype=np.float32) * 0.01)
    lengths = jnp.asarray(rng.integers(S // 3, S - STEPS - 1, (B,)), jnp.int32)
    q0 = jnp.asarray(
        rng.standard_normal((B, NH, 1, D), dtype=np.float32), jnp.bfloat16
    )
    scale = 1.0 / D ** 0.5
    layers = jnp.arange(L, dtype=jnp.int32)
    rows = jnp.arange(B)

    def kernel_ro(q0, k_all, v_all, ks, vs, lengths):
        def step(q, _):
            def layer(qc, li):
                o = slot_decode_attention(
                    qc, k_all, v_all, ks, vs, li, lengths, scale=scale
                )
                return (o.reshape(B, NH, 1, D) * 0.01 + q0).astype(q0.dtype), None

            q, _ = jax.lax.scan(layer, q, layers)
            return q, None

        q, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return q

    def kernel_rw(q0, k_all, v_all, ks, vs, lengths):
        def step(carry, _):
            q, k_all, v_all, ks, vs = carry

            def layer(inner, li):
                qc, k_all, v_all, ks, vs = inner
                k_all = k_all.at[li, rows, :, lengths, :].set(
                    jnp.round(qc[:, :NKV, 0, :] * 10).astype(jnp.int8)
                )
                ks2 = ks.at[li, rows, :, lengths].set(0.01)
                o = slot_decode_attention(
                    qc, k_all, v_all, ks2, vs, li, lengths, scale=scale
                )
                qn = (o.reshape(B, NH, 1, D) * 0.01 + q0).astype(q0.dtype)
                return (qn, k_all, v_all, ks2, vs), None

            (q, k_all, v_all, ks, vs), _ = jax.lax.scan(
                layer, (q, k_all, v_all, ks, vs), layers
            )
            return (q, k_all, v_all, ks, vs), None

        (q, *_), _ = jax.lax.scan(step, (q0, k_all, v_all, ks, vs), None, length=STEPS)
        return q

    def einsum_ro(q0, k_all, v_all, ks, vs, lengths):
        mask = jnp.arange(S)[None, :] <= lengths[:, None]

        def step(q, _):
            def layer(qc, li):
                o = attention_kv_int8(
                    qc,
                    jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(ks, li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(vs, li, 0, keepdims=False),
                    mask[:, None, None, :],
                    scale,
                )
                return (o.reshape(B, NH, 1, D) * 0.01 + q0).astype(q0.dtype), None

            q, _ = jax.lax.scan(layer, q, layers)
            return q, None

        q, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return q

    def integrated(q0, k_all, v_all, ks, vs, lengths):
        mask = jnp.arange(S)[None, None, None, :] <= lengths[:, None, None, None]

        def step(carry, _):
            q, k_all, v_all, ks, vs = carry

            def layer(inner, li):
                qc, k_all, v_all, ks, vs = inner
                newk = (qc * 0.1).astype(jnp.float32)
                attn, k_all, v_all, ks, vs = slot_kv_write_attend(
                    qc, newk[:, :NKV], newk[:, :NKV], k_all, v_all, ks, vs,
                    li, lengths, mask, scale,
                )
                qn = (attn.reshape(B, NH, 1, D) * 0.01 + q0).astype(q0.dtype)
                return (qn, k_all, v_all, ks, vs), None

            (q, k_all, v_all, ks, vs), _ = jax.lax.scan(
                layer, (q, k_all, v_all, ks, vs), layers
            )
            return (q, k_all, v_all, ks, vs), None

        (q, *_), _ = jax.lax.scan(step, (q0, k_all, v_all, ks, vs), None, length=STEPS)
        return q

    fns = {
        "kernel-ro": kernel_ro,
        "kernel-rw": kernel_rw,
        "einsum-ro": einsum_ro,
        "integrated": integrated,
    }
    if jax.default_backend() != "cpu":
        from .probe import probe_tunnel

        dt = probe_tunnel(3600.0, tag="kernels")
        print(f"probe ok in {dt:.1f}s backend={jax.default_backend()}",
              flush=True)
    else:
        t = time.perf_counter()
        np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        print(f"probe ok in {time.perf_counter() - t:.1f}s "
              f"backend={jax.default_backend()}", flush=True)
    for name in args.variants.split(","):
        name = name.strip()
        if name not in fns:
            raise SystemExit(f"unknown variant {name!r} (have {sorted(fns)})")
        _bench(name, fns[name], (q0, k_all, v_all, ks, vs, lengths),
               STEPS, L, args.reps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
