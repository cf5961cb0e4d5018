"""Weights-day teacher runners (VERDICT r3 #6): per-family HF teachers
that dump the exact artifact schema capture_and_gate consumes.

No weights/network exist here, so the HF flow is driven with fake
processor/model doubles injected through the ChatTemplateTeacher hooks;
what these tests pin is the artifact contract (reference
benchsuite/models/base.py:620-805 python-baseline flow and
benchsuite/schemas.py BaselineTokens)."""

import json
import pathlib
import sys

import numpy as np
import pytest

from dsocr_tpu.bench.capture import capture_baseline
from dsocr_tpu.bench.teachers import STRICT_FAMILIES, TEACHERS
from dsocr_tpu.bench.teachers._chat import ChatTemplateTeacher


class FakeTokenizer:
    def decode(self, ids, skip_special_tokens=True):
        return "decoded:" + ",".join(map(str, ids))


class FakeProcessor:
    tokenizer = FakeTokenizer()

    def apply_chat_template(self, messages, tokenize=False, **kw):
        text = messages[0]["content"][1]["text"]
        if not tokenize:
            return f"<chat>{text}</chat>"
        import torch

        return {"input_ids": torch.tensor([[9, 8, 7]])}

    def __call__(self, images, text, return_tensors="pt"):
        import torch

        return {"input_ids": torch.tensor([[1, 2, 3, 4]])}


class FakeModel:
    def generate(self, input_ids=None, max_new_tokens=8, **kw):
        import torch

        assert kw.get("do_sample") is False  # greedy pinned (base.py:648)
        assert kw.get("use_cache", True) is True
        n = input_ids.shape[1]
        gen = torch.arange(100, 100 + max_new_tokens)[None]
        return torch.cat([input_ids, gen], dim=1)


class StubChatTeacher(ChatTemplateTeacher):
    model_id = "stub-family"

    def load_processor(self):
        return FakeProcessor()

    def load_model(self, torch):
        return FakeModel()


@pytest.fixture
def png(tmp_path):
    from PIL import Image

    p = tmp_path / "page.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ).save(p)
    return p


def test_registry_covers_all_families():
    assert set(TEACHERS) == {"deepseek", "glm", "paddle", "dots"}
    # strict-gate parity with the reference capability matrix
    assert set(STRICT_FAMILIES) == {"deepseek", "glm"}


def test_chat_teacher_artifact_schema(png, tmp_path):
    teacher = StubChatTeacher(tmp_path)
    path = capture_baseline(teacher, png, "Free OCR.", 5, tmp_path / "out")
    payload = json.loads(path.read_text())
    assert payload["rendered_prompt"] == "<chat>Free OCR.</chat>"
    assert payload["prompt_tokens"] == [1, 2, 3, 4]
    assert payload["generated_tokens"] == [100, 101, 102, 103, 104]
    assert payload["text"].startswith("decoded:")
    assert payload["max_new_tokens"] == 5
    # reproducibility breadcrumbs recorded
    assert "transformers_version" in payload["extra"]
    assert payload["extra"]["family"] == "stub-family"
    assert "model.load" in payload["stage_totals"]


def test_glm_teacher_tokenizes_via_chat_template(png, tmp_path):
    from dsocr_tpu.bench.teachers.glm import HFGlmTeacher

    class StubGlm(HFGlmTeacher):
        def load_processor(self):
            return FakeProcessor()

        def load_model(self, torch):
            return FakeModel()

    path = capture_baseline(
        StubGlm(tmp_path), png, "Text Recognition:", 3, tmp_path / "out"
    )
    payload = json.loads(path.read_text())
    # GLM path: apply_chat_template(tokenize=True) ids, not processor()
    assert payload["prompt_tokens"] == [9, 8, 7]
    assert payload["rendered_prompt"] == "Text Recognition:"
    assert payload["generated_tokens"] == [100, 101, 102]


def test_teacher_cli_writes_artifact(png, tmp_path, monkeypatch):
    """python -m dsocr_tpu.bench.teachers --family ... writes the
    artifact via the registry (teacher factory monkeypatched — no
    weights here)."""
    import dsocr_tpu.bench.teachers as teachers_pkg
    from dsocr_tpu.bench.teachers.__main__ import main

    seen_kw = {}
    monkeypatch.setitem(
        teachers_pkg.TEACHERS,
        "deepseek",
        lambda model_dir, **kw: (seen_kw.update(kw), StubChatTeacher(model_dir))[1],
    )
    out = tmp_path / "artifact"
    rc = main(
        [
            "--family", "deepseek",
            "--model-dir", str(tmp_path),
            "--image", str(png),
            "--prompt", "Free OCR.",
            "--max-new-tokens", "4",
            "--out", str(out),
        ]
    )
    assert rc == 0
    # remote-code execution is opt-in (r4 advisor): default must be off
    assert seen_kw == {"trust_remote_code": False}
    payload = json.loads((out / "baseline.json").read_text())
    assert payload["generated_tokens"] == [100, 101, 102, 103]


def test_teacher_cli_gate_against_self(png, tmp_path, monkeypatch):
    """--gate strict-compares our candidate against the teacher; with a
    candidate decode_fn echoing the baseline it must pass. (The real
    path shells out to our CLI with weights — injected here.)"""
    import dsocr_tpu.bench.capture as capture_mod
    from dsocr_tpu.bench.capture import capture_and_gate

    result = capture_and_gate(
        StubChatTeacher(tmp_path), png, "p", 3, tmp_path / "o",
        decode_fn=lambda b: {
            "generated_tokens": b["generated_tokens"],
            "rendered_prompt": b["rendered_prompt"],
        },
    )
    assert result.passed
