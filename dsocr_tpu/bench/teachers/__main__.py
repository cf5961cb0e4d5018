"""Weights-day teacher CLI.

    python -m dsocr_tpu.bench.teachers \
        --family deepseek --model-dir ~/weights/DeepSeek-OCR \
        --image page.png --prompt "<image>\\nFree OCR." \
        --max-new-tokens 512 --out baselines/deepseek_free_ocr [--gate]

Runs the family's HF teacher and writes ``baseline.json`` (+ .npy
goldens) in the exact schema ``dsocr_tpu.bench gate`` and
tests/test_baselines.py consume; with ``--gate`` it then runs our CLI on
the same case and strict-gates the token streams (reference
orchestrator.py:456-521 semantics)."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def main(argv=None) -> int:
    from . import STRICT_FAMILIES, TEACHERS
    from ..capture import capture_and_gate, capture_baseline

    ap = argparse.ArgumentParser(prog="dsocr_tpu.bench.teachers")
    ap.add_argument("--family", choices=sorted(TEACHERS), required=True)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument(
        "--gate",
        action="store_true",
        help="also run our engine on the case and strict-gate the tokens",
    )
    ap.add_argument(
        "--trust-remote-code",
        action="store_true",
        help="allow transformers to execute code shipped inside "
        "--model-dir (the DeepSeek-OCR / dots.ocr HF repos require it; "
        "off by default because it runs arbitrary downloaded code)",
    )
    args = ap.parse_args(argv)

    if args.family not in STRICT_FAMILIES:
        print(
            f"[teachers] note: `{args.family}` has no reference-sanctioned "
            "python baseline (benchsuite capability matrix) — artifact is "
            "best-effort",
            file=sys.stderr,
        )
    teacher = TEACHERS[args.family](
        pathlib.Path(args.model_dir),
        trust_remote_code=args.trust_remote_code,
    )
    if args.gate:
        result = capture_and_gate(
            teacher,
            pathlib.Path(args.image),
            args.prompt,
            args.max_new_tokens,
            pathlib.Path(args.out),
        )
        print(json.dumps(result.to_json()))
        return 0 if result.passed else 1
    path = capture_baseline(
        teacher,
        pathlib.Path(args.image),
        args.prompt,
        args.max_new_tokens,
        pathlib.Path(args.out),
    )
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
