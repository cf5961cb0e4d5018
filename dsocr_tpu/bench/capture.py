"""Baseline capture: produce golden artifacts from an HF-Transformers
teacher, then strict-gate our engine against them.

Mirrors the reference benchsuite's python-baseline flow
(benchsuite/models/base.py:657-805 run_python_bench and
benchsuite/models/deepseek.py:128-260): load the HF model with
trust_remote_code, force greedy decoding with no_repeat_ngram_size=20
through a wrapped ``generate``, record prompt/generated token ids, and
write ``baselines/<name>/baseline.json`` (+ optional .npy goldens) in
the exact schema consumed by tests/test_baselines.py and
``dsocr_tpu.bench gate``.

The teacher is pluggable so the flow is testable offline (this machine
has no weights): ``HFDeepseekTeacher`` is the real adapter; tests drive
``capture_baseline`` with a synthetic stub teacher. Per reference
parity, only the DeepSeek family has a python baseline
(benchsuite/models/paddle.py:15 python_baseline=False, same for
dots/glm).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Any, Callable, Dict, List, Optional, Protocol, Sequence

import numpy as np


@dataclasses.dataclass
class TeacherResult:
    """What a teacher run must produce for one (image, prompt) case."""

    rendered_prompt: str
    prompt_tokens: List[int]
    generated_tokens: List[int]
    text: str = ""
    # optional golden tensors, written as <name>.npy next to baseline.json
    goldens: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    load_time_s: float = 0.0
    infer_time_s: float = 0.0
    # reproducibility breadcrumbs (e.g. transformers version), written
    # into baseline.json under "extra"
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)


class Teacher(Protocol):
    model_id: str

    def run(
        self, image: pathlib.Path, prompt: str, max_new_tokens: int
    ) -> TeacherResult: ...


def normalize_deepseek_prompt(prompt: str) -> str:
    """Reference prompt canonicalization (benchsuite/models/deepseek.py:84-89):
    ensure a single leading ``<image>`` marker."""
    canonical = prompt.rstrip()
    if "<image>" in canonical:
        return canonical
    if not canonical.startswith("\n"):
        canonical = "\n" + canonical
    return f"<image>{canonical}"


class HFDeepseekTeacher:
    """DeepSeek-OCR teacher over HF Transformers (CPU, f32).

    Follows benchsuite/models/deepseek.py:128-260: AutoModel with
    trust_remote_code, cuda/autocast no-op patches so the repo's CUDA
    assumptions run on CPU, wrapped ``generate`` pinning greedy +
    no_repeat_ngram_size=20, and ``model.infer`` driving the repo's own
    preprocessing. Vision goldens are captured with forward hooks when
    the module names are present.
    """

    def __init__(
        self,
        model_dir: pathlib.Path,
        model_id: str = "deepseek-ocr",
        base_size: int = 1024,
        image_size: int = 640,
        crop_mode: bool = True,
        capture_goldens: bool = True,
        trust_remote_code: bool = False,
    ):
        self.model_dir = pathlib.Path(model_dir)
        self.model_id = model_id
        self.base_size = base_size
        self.image_size = image_size
        self.crop_mode = crop_mode
        self.capture_goldens = capture_goldens
        # executes arbitrary code from model_dir when True — the teachers
        # CLI gates it behind an explicit --trust-remote-code (r4 advisor)
        self.trust_remote_code = trust_remote_code

    def run(
        self, image: pathlib.Path, prompt: str, max_new_tokens: int
    ) -> TeacherResult:
        import contextlib
        import tempfile

        import torch
        from transformers import AutoModel, AutoTokenizer

        torch.manual_seed(0)
        np.random.seed(0)

        t0 = time.perf_counter()
        trc = self.trust_remote_code
        tokenizer = AutoTokenizer.from_pretrained(
            str(self.model_dir), trust_remote_code=trc
        )
        model = AutoModel.from_pretrained(
            str(self.model_dir), trust_remote_code=trc, use_safetensors=True
        )
        model = model.to(torch.float32).eval().to(torch.device("cpu"))
        load_time_s = time.perf_counter() - t0

        rendered = normalize_deepseek_prompt(prompt)
        capture: Dict[str, Any] = {}
        goldens: Dict[str, np.ndarray] = {}
        origin_generate = model.generate

        def wrapped_generate(*args: Any, **kwargs: Any) -> Any:
            kwargs["max_new_tokens"] = int(max_new_tokens)
            kwargs["do_sample"] = False
            kwargs["temperature"] = 0.0
            kwargs["use_cache"] = True
            kwargs["no_repeat_ngram_size"] = 20
            if args and hasattr(args[0], "shape"):
                capture["input_ids"] = args[0].detach().cpu()
            out = origin_generate(*args, **kwargs)
            capture["output_ids"] = (
                out.detach().cpu() if hasattr(out, "detach") else out
            )
            return out

        hooks = []
        if self.capture_goldens:
            for attr, name in (
                ("vision_model", "vision_embeddings"),
                ("projector", "projector_output"),
            ):
                module = getattr(model, attr, None)
                if module is None:
                    continue

                def _hook(_m, _i, output, _name=name):
                    t = output[0] if isinstance(output, (tuple, list)) else output
                    if hasattr(t, "detach"):
                        goldens[_name] = (
                            t.detach().to(torch.float32).cpu().numpy()
                        )

                hooks.append(module.register_forward_hook(_hook))

        # The repo's modeling code assumes CUDA; no-op the transfers so the
        # f32 CPU path runs (ref deepseek.py:215-240).
        patches = [
            (torch.Tensor, "cuda", lambda self, *a, **k: self),
            (torch.nn.Module, "cuda", lambda self, *a, **k: self),
        ]
        saved = [(o, n, getattr(o, n)) for o, n, _ in patches]
        saved_autocast = torch.autocast
        saved_bf16 = torch.bfloat16

        @contextlib.contextmanager
        def _autocast_noop(*a, **k):
            yield

        model.generate = wrapped_generate
        for obj, name, fn in patches:
            setattr(obj, name, fn)
        torch.autocast = _autocast_noop
        torch.bfloat16 = torch.float32
        t1 = time.perf_counter()
        try:
            with tempfile.TemporaryDirectory(prefix="dsocr_capture_") as tmp:
                text = model.infer(
                    tokenizer,
                    prompt=rendered,
                    image_file=str(image),
                    output_path=tmp,
                    base_size=self.base_size,
                    image_size=self.image_size,
                    crop_mode=self.crop_mode,
                    save_results=False,
                    eval_mode=True,
                )
        finally:
            for obj, name, fn in saved:
                setattr(obj, name, fn)
            torch.autocast = saved_autocast
            torch.bfloat16 = saved_bf16
            model.generate = origin_generate
            for h in hooks:
                h.remove()
        infer_time_s = time.perf_counter() - t1

        if "output_ids" not in capture:
            raise RuntimeError("teacher generate() was never invoked")
        output_ids = capture["output_ids"]
        row = output_ids[0].tolist() if output_ids.ndim == 2 else output_ids.tolist()
        input_len = (
            int(capture["input_ids"].shape[1]) if "input_ids" in capture else 0
        )
        return TeacherResult(
            rendered_prompt=rendered,
            prompt_tokens=row[:input_len],
            generated_tokens=row[input_len:],
            text=text if isinstance(text, str) else "",
            goldens=goldens,
            load_time_s=load_time_s,
            infer_time_s=infer_time_s,
        )


def capture_baseline(
    teacher: Teacher,
    image: pathlib.Path,
    prompt: str,
    max_new_tokens: int,
    out_dir: pathlib.Path,
) -> pathlib.Path:
    """Run the teacher and persist baseline.json + goldens under out_dir.

    Schema matches tests/test_baselines.py and the reference's
    baselines/ layout (infer-deepseek/tests/baseline.rs)."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    result = teacher.run(pathlib.Path(image), prompt, max_new_tokens)
    payload = {
        "model_id": teacher.model_id,
        "prompt": prompt,
        "rendered_prompt": result.rendered_prompt,
        "image": str(image),
        "max_new_tokens": max_new_tokens,
        "prompt_tokens": list(map(int, result.prompt_tokens)),
        "generated_tokens": list(map(int, result.generated_tokens)),
        "text": result.text,
        "stage_totals": {
            "model.load": result.load_time_s * 1e3,
            "decode.generate": result.infer_time_s * 1e3,
        },
    }
    if result.extra:
        payload["extra"] = result.extra
    baseline_path = out_dir / "baseline.json"
    baseline_path.write_text(json.dumps(payload, indent=2))
    for name, arr in result.goldens.items():
        np.save(out_dir / f"{name}.npy", np.asarray(arr))
    return baseline_path


def run_candidate(
    baseline_path: pathlib.Path,
    out_path: pathlib.Path,
    decode_fn: Optional[Callable[[dict], dict]] = None,
) -> pathlib.Path:
    """Produce the candidate artifact (our CLI's --output-json schema)
    for the baseline's case.

    decode_fn(baseline_payload) -> candidate payload dict; the default
    runs our CLI in-process (dsocr_tpu.cli) against the registered model
    — which needs real weights, hence injectable for offline tests."""
    baseline = json.loads(pathlib.Path(baseline_path).read_text())
    if decode_fn is None:
        decode_fn = _cli_decode
    payload = decode_fn(baseline)
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(payload, indent=2))
    return out_path


def _cli_decode(baseline: dict) -> dict:
    import subprocess
    import sys
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        out_json = tmp.name
    cmd = [
        sys.executable, "-m", "dsocr_tpu.cli",
        "--model", baseline.get("model_id", "deepseek-ocr"),
        "--image", baseline["image"],
        "--prompt", baseline["prompt"],
        "--max-new-tokens", str(baseline.get("max_new_tokens", 64)),
        "--output-json", out_json,
        "--quiet",
    ]
    subprocess.run(cmd, check=True)
    return json.loads(pathlib.Path(out_json).read_text())


def capture_and_gate(
    teacher: Teacher,
    image: pathlib.Path,
    prompt: str,
    max_new_tokens: int,
    out_dir: pathlib.Path,
    decode_fn: Optional[Callable[[dict], dict]] = None,
    stop_ids: Sequence[int] = (1, 100001),
):
    """End-to-end: capture the teacher baseline, run our engine on the
    same case, strict-gate the token streams (orchestrator.py:456-521)."""
    from .gate import gate_files

    baseline_path = capture_baseline(
        teacher, image, prompt, max_new_tokens, out_dir
    )
    candidate_path = run_candidate(
        baseline_path, pathlib.Path(out_dir) / "candidate.json", decode_fn
    )
    return gate_files(baseline_path, candidate_path, stop_ids=tuple(stop_ids))
