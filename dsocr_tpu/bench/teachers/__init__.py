"""Per-family HF-Transformers teacher runners for weights day.

The reference can *produce* its Python baselines (auto-bootstrapped
venvs driving HF Transformers — benchsuite/models/base.py:36-805); this
repo consumes baseline artifacts through the Teacher protocol
(bench/capture.py). These modules close the gap: given downloaded
weights + a working transformers install, each teacher dumps the exact
artifact schema ``capture_baseline``/``capture_and_gate`` consume
(baseline.json: rendered_prompt, prompt_tokens, generated_tokens, text,
plus optional .npy goldens) — so the weights-day runbook is
``python -m dsocr_tpu.bench.teachers --family X ... && dsocr_tpu.bench
gate``, zero new code.

Capability parity with the reference's matrix
(benchsuite/models/{deepseek,glm}.py capabilities python_baseline=True;
paddle.py:15 and dots.py:15 python_baseline=False): deepseek and glm
are the strict-gate families; the paddle and dots teachers are
best-effort extras built on the same HF chat-template flow the
reference's BaseAdapter uses (base.py:620-655) and may need
model-repo-specific tweaks when first run against real weights.

Pinned behavior (matching base.py:648-655 python_generate): CPU, f32,
greedy (``do_sample=False``), ``use_cache=True``, seeded torch/numpy.
Transformers version: the reference pins per-model venv extras
(pyproject ``bench``/``bench-glm``); record the installed version in the
artifact for reproducibility.
"""

from __future__ import annotations

from typing import Callable, Dict

from ..capture import HFDeepseekTeacher, Teacher  # noqa: F401


def _deepseek(model_dir, **kw):
    return HFDeepseekTeacher(model_dir, **kw)


def _glm(model_dir, **kw):
    from .glm import HFGlmTeacher

    return HFGlmTeacher(model_dir, **kw)


def _paddle(model_dir, **kw):
    from .paddle import HFPaddleTeacher

    return HFPaddleTeacher(model_dir, **kw)


def _dots(model_dir, **kw):
    from .dots import HFDotsTeacher

    return HFDotsTeacher(model_dir, **kw)


TEACHERS: Dict[str, Callable[..., "Teacher"]] = {
    "deepseek": _deepseek,
    "glm": _glm,
    "paddle": _paddle,
    "dots": _dots,
}

# families whose python baseline is reference-sanctioned strict-gate
# material (benchsuite/README.md:28-41 capability matrix)
STRICT_FAMILIES = ("deepseek", "glm")
