"""Benchsuite CLI (ref benchsuite/cli.py:97-186):

    python -m dsocr_tpu.bench gate --baseline base.json --candidate cand.json
    python -m dsocr_tpu.bench perf --models deepseek-ocr --dtypes bfloat16 \
        --image page.png --history perf_history.json
    python -m dsocr_tpu.bench matrix-gate --pairs base1.json:cand1.json ...
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def cmd_gate(args) -> int:
    from .gate import gate_files

    result = gate_files(
        pathlib.Path(args.baseline),
        pathlib.Path(args.candidate),
        stop_ids=tuple(int(x) for x in args.stop_ids.split(",") if x),
    )
    print(json.dumps(result.to_json(), indent=2))
    return 0 if result.passed else 1


def cmd_matrix_gate(args) -> int:
    from .gate import gate_files

    failures = 0
    for pair in args.pairs:
        base, cand = pair.split(":", 1)
        result = gate_files(pathlib.Path(base), pathlib.Path(cand))
        status = "PASS" if result.passed else f"FAIL ({result.detail})"
        print(f"{base} vs {cand}: {status}")
        failures += 0 if result.passed else 1
    return 1 if failures else 0


def cmd_capture(args) -> int:
    """Capture an HF-teacher baseline (and optionally gate our engine).

    Needs real weights + an HF Transformers checkout of the model
    (zero-egress machines can't run this; tests drive the same flow
    with a stub teacher)."""
    import pathlib as _pl

    from .capture import HFDeepseekTeacher, capture_and_gate, capture_baseline

    teacher = HFDeepseekTeacher(
        _pl.Path(args.model_dir),
        model_id=args.model,
        base_size=args.base_size,
        image_size=args.image_size,
        crop_mode=args.crop_mode,
    )
    if args.gate:
        result = capture_and_gate(
            teacher, _pl.Path(args.image), args.prompt,
            args.max_new_tokens, _pl.Path(args.out),
        )
        print(json.dumps(result.to_json(), indent=2))
        return 0 if result.passed else 1
    path = capture_baseline(
        teacher, _pl.Path(args.image), args.prompt,
        args.max_new_tokens, _pl.Path(args.out),
    )
    print(str(path))
    return 0


def cmd_bench_native(args) -> int:
    """Run OUR CLI on one case and save the --output-json artifact (the
    reference's `bench-rust`, benchsuite/cli.py:97-186). Requires real
    weights to produce meaningful tokens."""
    from .capture import run_candidate
    import pathlib as _pl
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        base = tmp.name
    _pl.Path(base).write_text(json.dumps({
        "model_id": args.model,
        "image": args.image,
        "prompt": args.prompt,
        "max_new_tokens": args.max_new_tokens,
    }))
    out = run_candidate(_pl.Path(base), _pl.Path(args.output))
    print(str(out))
    return 0


def cmd_perf(args) -> int:
    # Persistent compile cache: the matrix's shape buckets (per-cell
    # tower/prefill/chunk shapes) each cost a minutes-long remote
    # compile on the tunneled TPU; without the disk cache every matrix
    # run re-pays all of them and the history compares compile time,
    # not runtime. Must be a jax.config update — this machine
    # auto-imports jax before the env var could be read.
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .perf import compare_history, run_perf_matrix, save_history

    # incremental save: a wedged/failed later cell must not lose the
    # cells already measured in this session (merge by matrix key with
    # any prior history entries not re-run here)
    on_entry = None
    prior_history = None
    if args.history:
        _hpath = pathlib.Path(args.history)
        if _hpath.exists():
            # snapshot BEFORE the run: on_entry overwrites the file, and
            # the end-of-run regression compare must be vs the previous
            # session, not this one
            import shutil
            import tempfile

            prior_history = pathlib.Path(
                tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
            )
            shutil.copy(_hpath, prior_history)

        def on_entry(entries_so_far):
            import dataclasses as _dc
            import time as _time

            path = pathlib.Path(args.history)
            merged = {}
            if path.exists():
                try:
                    for e in json.loads(path.read_text()).get("entries", []):
                        merged[
                            (e["model"], e["dtype"], e.get("quant", ""),
                             e.get("mode", "single"), e.get("kv_quant", ""))
                        ] = e
                except Exception:
                    merged = {}
            for e in entries_so_far:
                merged[
                    (e.model, e.dtype, e.quant, e.mode, e.kv_quant)
                ] = _dc.asdict(e)
            path.write_text(
                json.dumps(
                    {"recorded_at": _time.time(),
                     "entries": list(merged.values())},
                    indent=2,
                )
            )

    entries = run_perf_matrix(
        models=args.models.split(","),
        dtypes=args.dtypes.split(","),
        image_path=pathlib.Path(args.image),
        max_new_tokens=args.max_new_tokens,
        quants=args.quants.split(",") if args.quants is not None else None,
        modes=args.modes.split(",") if args.modes is not None else None,
        kv_quants=(
            args.kv_quants.split(",") if args.kv_quants is not None else None
        ),
        n_requests=args.requests,
        warmup=not args.no_warmup,
        on_entry=on_entry,
    )
    for e in entries:
        label = "/".join(
            filter(None, (e.model, e.dtype, e.quant, e.kv_quant, e.mode))
        )
        print(
            f"{label}: wall {e.wall_s:.2f}s, "
            f"{e.tokens_per_sec:.1f} tok/s, {e.pages_per_sec:.2f} pages/s"
        )
        for stage, ms in sorted(e.stage_totals.items()):
            print(f"    {stage:30s} {ms:10.1f} ms")
    if args.history:
        history_path = pathlib.Path(args.history)
        if prior_history is not None:
            compare_against = prior_history
        else:
            # no pre-run history existed; on_entry has been writing the
            # file DURING the run, so comparing against history_path now
            # would compare the session to itself — report the honest
            # "no baseline" note instead
            compare_against = history_path.with_suffix(".absent")
        report = compare_history(entries, compare_against)
        print(json.dumps(report, indent=2))
        if prior_history is not None:
            prior_history.unlink(missing_ok=True)
        if on_entry is not None and entries:
            on_entry(entries)  # final merged save
        elif entries:
            save_history(entries, history_path)
        if report.get("regressions") and args.fail_on_regression:
            return 1
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="dsocr-bench", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    g = sub.add_parser("gate", help="strict token comparison")
    g.add_argument("--baseline", required=True)
    g.add_argument("--candidate", required=True)
    g.add_argument("--stop-ids", default="1,100001")
    g.set_defaults(fn=cmd_gate)

    m = sub.add_parser("matrix-gate", help="gate a list of baseline:candidate pairs")
    m.add_argument("pairs", nargs="+")
    m.set_defaults(fn=cmd_matrix_gate)

    c = sub.add_parser(
        "capture", help="capture an HF-teacher baseline (requires weights)"
    )
    c.add_argument("--model-dir", required=True, help="HF model directory")
    c.add_argument("--model", default="deepseek-ocr")
    c.add_argument("--image", required=True)
    c.add_argument("--prompt", default="<image>\nFree OCR.")
    c.add_argument("--max-new-tokens", type=int, default=64)
    c.add_argument("--out", default="baselines/sample")
    c.add_argument("--base-size", type=int, default=1024)
    c.add_argument("--image-size", type=int, default=640)
    c.add_argument(
        "--crop-mode", type=lambda v: v.lower() in ("1", "true"), default=True
    )
    c.add_argument(
        "--gate", action="store_true",
        help="also run our CLI on the case and strict-gate the tokens",
    )
    c.set_defaults(fn=cmd_capture)

    for alias in ("bench-native", "bench-rust"):
        bn = sub.add_parser(
            alias, help="run our CLI on one case, save the candidate JSON"
        )
        bn.add_argument("--model", default="deepseek-ocr")
        bn.add_argument("--image", required=True)
        bn.add_argument("--prompt", default="<image>\nFree OCR.")
        bn.add_argument("--max-new-tokens", type=int, default=64)
        bn.add_argument("--output", required=True)
        bn.set_defaults(fn=cmd_bench_native)

    # reference name for the teacher capture (benchsuite `bench-python`)
    bp = sub.add_parser("bench-python", help="alias of `capture`")
    bp.add_argument("--model-dir", required=True)
    bp.add_argument("--model", default="deepseek-ocr")
    bp.add_argument("--image", required=True)
    bp.add_argument("--prompt", default="<image>\nFree OCR.")
    bp.add_argument("--max-new-tokens", type=int, default=64)
    bp.add_argument("--out", default="baselines/sample")
    bp.add_argument("--base-size", type=int, default=1024)
    bp.add_argument("--image-size", type=int, default=640)
    bp.add_argument(
        "--crop-mode", type=lambda v: v.lower() in ("1", "true"), default=True
    )
    bp.add_argument("--gate", action="store_true")
    bp.set_defaults(fn=cmd_capture)

    p = sub.add_parser("perf", help="perf matrix with history compare")
    p.add_argument("--models", default="paddleocr-vl")
    p.add_argument("--dtypes", default="bfloat16")
    p.add_argument("--image", required=True)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument(
        "--quants", default=None,
        help="comma list of '', q8_0, q4_k, q6_k (all families but glm)",
    )
    p.add_argument(
        "--modes", default=None,
        help="comma list of single, serve (continuous batching)",
    )
    p.add_argument(
        "--kv-quants", dest="kv_quants", default=None,
        help="comma list of '', int8 (KV-cache quantization axis — the "
        "headline serving config is q8_0+int8)",
    )
    p.add_argument("--requests", type=int, default=4, help="pages in serve mode")
    p.add_argument(
        "--no-warmup", action="store_true",
        help="skip the untimed warmup pass per cell (cells then include "
        "first-dispatch compile time; only for plumbing smokes)",
    )
    p.add_argument("--history", default=None)
    p.add_argument("--fail-on-regression", action="store_true")
    p.set_defaults(fn=cmd_perf)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
