"""CLI inference runner.

Flow mirrors crates/cli/src/app.rs:43-369: load config + overrides →
resolve model paths (downloading if needed) → load engine → render
prompt with the conversation template → validate image slots → stream
deltas to stdout via DeltaTracker → decode → throughput summary →
optional bench JSON. `--quiet` keeps stdout clean for gating scripts.
`weights snapshot` prints the dsq export command.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
from typing import List, Optional

import numpy as np

from ..config import AppConfig, VirtualFileSystem, prepare_model_paths
from ..config.args import (
    add_common_inference_args,
    add_common_model_args,
    inference_override_from_args,
)
from ..core import DeltaTracker, VisionSettings, render_prompt
from ..core.benchmark import BenchRecorder, Timer, set_recorder
from ..models.registry import load_engine
from ..utils.tokenizer import load_tokenizer


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="dsocr", description="TPU-native OCR inference CLI"
    )
    sub = parser.add_subparsers(dest="subcommand")

    run = parser  # flags live on the root parser like the reference CLI
    run.add_argument("--prompt", default=None, help="prompt text (use <image> slots)")
    run.add_argument("--prompt-file", default=None, help="read the prompt from a file")
    run.add_argument(
        "--image", action="append", default=[], help="image path (repeatable)"
    )
    add_common_model_args(run)
    add_common_inference_args(run)
    run.add_argument("--bench", action="store_true", help="record stage timings")
    run.add_argument("--bench-output", default=None, help="write bench JSON here")
    run.add_argument("--output-json", default=None, help="write decode result JSON")
    run.add_argument("--quiet", action="store_true", help="suppress logs; stdout = text")
    run.add_argument("--max-seq-len", type=int, default=8192)

    weights = sub.add_parser("weights", help="weight utilities")
    wsub = weights.add_subparsers(dest="weights_command", required=True)
    snap = wsub.add_parser("snapshot", help="print the dsq export command")
    snap.add_argument("--model", default=None)
    snap.add_argument("--dtype", default="q6k")
    return parser


def run_weights_snapshot(args) -> int:
    model_id = args.model or "deepseek-ocr"
    vfs = VirtualFileSystem()
    print(
        "python -m dsocr_tpu.dsq export "
        f"--weights {vfs.model_weights(model_id)} "
        f"--config {vfs.model_config(model_id)} "
        f"--dtype {args.dtype} --targets text "
        f"--output {vfs.model_snapshot(model_id + '-' + args.dtype)}"
    )
    return 0


def run_inference(args) -> int:
    quiet = args.quiet
    from ..utils.logging import init_logging

    init_logging(quiet=quiet)
    recorder: Optional[BenchRecorder] = None
    if args.bench or args.bench_output:
        recorder = BenchRecorder()
        set_recorder(recorder)

    def log(*parts):
        if not quiet:
            print(*parts, file=sys.stderr)

    prompt = args.prompt
    if args.prompt_file:
        prompt = pathlib.Path(args.prompt_file).read_text()
    if prompt is None:
        print("error: --prompt or --prompt-file required", file=sys.stderr)
        return 1

    config = (
        AppConfig.load_or_init(pathlib.Path(args.config))
        if args.config
        else AppConfig.load_or_init(VirtualFileSystem().config_file())
    )
    model_id = args.model or config.models.active
    entry = config.models.entries.get(model_id)
    if entry is None:
        print(f"error: unknown model `{model_id}`", file=sys.stderr)
        return 1
    override = inference_override_from_args(args)
    settings = config.resolved_inference(model_id, override)

    # image slots must match prompt placeholders (ref app.rs)
    slots = prompt.count("<image>")
    if slots != len(args.image):
        print(
            f"error: prompt has {slots} <image> slots but {len(args.image)} "
            "images were provided",
            file=sys.stderr,
        )
        return 1

    explicit = args.model_config or args.tokenizer or args.weights
    if explicit:
        config_path = pathlib.Path(args.model_config) if args.model_config else None
        tokenizer_path = pathlib.Path(args.tokenizer) if args.tokenizer else None
        weights_path = pathlib.Path(args.weights) if args.weights else None
        snapshot_path = pathlib.Path(args.snapshot) if args.snapshot else None
    else:
        log(f"Resolving assets for {model_id}...")
        paths = prepare_model_paths(config, model_id)
        config_path = paths.config
        tokenizer_path = paths.tokenizer
        weights_path = paths.weights
        snapshot_path = paths.snapshot
    if tokenizer_path is None:
        print("error: tokenizer path unresolved", file=sys.stderr)
        return 1

    from ..core.runtime_device import apply_device_selection

    apply_device_selection(settings.device)

    load_timer = Timer("model.load")
    engine = load_engine(
        entry.kind,
        config_path=config_path,
        weights_path=weights_path,
        snapshot_path=snapshot_path,
        dtype=settings.precision,
        max_seq_len=args.max_seq_len,
        mesh=args.mesh,
        kv_quant=getattr(args, "kv_quant", None),
    )
    load_timer.finish(model=model_id)
    tokenizer = load_tokenizer(tokenizer_path)

    from PIL import Image

    images = [np.asarray(Image.open(p).convert("RGB")) for p in args.image]
    rendered = render_prompt(settings.template, "", prompt)
    vision = VisionSettings(
        base_size=settings.base_size,
        image_size=settings.image_size,
        crop_mode=settings.crop_mode,
    )

    tracker = DeltaTracker()

    def stream(step: int, tokens: List[int]) -> None:
        text = tokenizer.decode(tokens, skip_special_tokens=True)
        delta = tracker.advance(text)
        if delta and not args.output_json:
            print(delta, end="", flush=True)

    t0 = time.perf_counter()
    outcome = engine.decode(
        tokenizer, rendered, images, vision, settings.decode,
        stream=None if args.output_json else stream,
    )
    wall = time.perf_counter() - t0
    if not args.output_json:
        final_delta = tracker.advance(outcome.text, is_final=True)
        if final_delta:
            print(final_delta, end="")
        print(flush=True)

    tok_s = outcome.response_tokens / wall if wall > 0 else 0.0
    log(
        f"prompt_tokens={outcome.prompt_tokens} "
        f"response_tokens={outcome.response_tokens} "
        f"wall={wall:.2f}s decode={tok_s:.1f} tok/s"
    )

    if args.output_json:
        result = {
            "text": outcome.text,
            "prompt_tokens": outcome.prompt_tokens,
            "response_tokens": outcome.response_tokens,
            "generated_tokens": outcome.generated_tokens,
            "rendered_prompt": rendered,
        }
        pathlib.Path(args.output_json).write_text(json.dumps(result, indent=2))

    if recorder is not None:
        report = recorder.to_json()
        if args.bench_output:
            pathlib.Path(args.bench_output).write_text(json.dumps(report, indent=2))
        else:
            log(json.dumps(report["stage_totals"], indent=2))
    return 0


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.subcommand == "weights":
        if args.weights_command == "snapshot":
            return run_weights_snapshot(args)
        return 1
    return run_inference(args)
