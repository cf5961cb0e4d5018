"""Baseline-capture harness driven end-to-end with a synthetic teacher.

The real HFDeepseekTeacher needs weights + the HF modeling code (absent
on this machine); these tests exercise the full capture → candidate →
strict-gate flow (ref benchsuite/models/base.py:657-805,
orchestrator.py:456-521) with a stub teacher, and check the artifact
schema matches what tests/test_baselines.py consumes."""

import json

import numpy as np
import pytest

from dsocr_tpu.bench.capture import (
    TeacherResult,
    capture_and_gate,
    capture_baseline,
    normalize_deepseek_prompt,
    run_candidate,
)


class StubTeacher:
    model_id = "deepseek-ocr"

    def __init__(self, generated=(5, 6, 7, 8)):
        self.generated = list(generated)

    def run(self, image, prompt, max_new_tokens):
        rendered = normalize_deepseek_prompt(prompt)
        return TeacherResult(
            rendered_prompt=rendered,
            prompt_tokens=[0, 11, 12, 13],
            generated_tokens=self.generated[:max_new_tokens],
            text="stub text",
            goldens={
                "vision_embeddings": np.arange(12, dtype=np.float32).reshape(4, 3),
                "projector_output": np.ones((4, 3), np.float32),
            },
        )


def test_normalize_prompt_matches_reference_rules():
    # benchsuite/models/deepseek.py:84-89
    assert normalize_deepseek_prompt("Free OCR.") == "<image>\nFree OCR."
    assert normalize_deepseek_prompt("\nFree OCR.  ") == "<image>\nFree OCR."
    assert normalize_deepseek_prompt("<image>\nx") == "<image>\nx"


def test_capture_writes_schema_and_goldens(tmp_path):
    img = tmp_path / "page.png"
    img.write_bytes(b"\x89PNG fake")
    path = capture_baseline(StubTeacher(), img, "Free OCR.", 64, tmp_path / "out")
    payload = json.loads(path.read_text())
    # exact keys tests/test_baselines.py reads
    assert payload["model_id"] == "deepseek-ocr"
    assert payload["prompt"] == "Free OCR."
    assert payload["rendered_prompt"] == "<image>\nFree OCR."
    assert payload["prompt_tokens"] == [0, 11, 12, 13]
    assert payload["generated_tokens"] == [5, 6, 7, 8]
    assert payload["image"] == str(img)
    ve = np.load(tmp_path / "out" / "vision_embeddings.npy")
    assert ve.shape == (4, 3)
    assert (tmp_path / "out" / "projector_output.npy").exists()


def test_capture_respects_max_new_tokens(tmp_path):
    img = tmp_path / "page.png"
    img.write_bytes(b"x")
    path = capture_baseline(StubTeacher(), img, "p", 2, tmp_path / "out")
    assert json.loads(path.read_text())["generated_tokens"] == [5, 6]


def test_capture_and_gate_pass_and_divergence(tmp_path):
    img = tmp_path / "page.png"
    img.write_bytes(b"x")

    def matching_candidate(baseline):
        return {
            "text": "stub text",
            "rendered_prompt": baseline["rendered_prompt"],
            "prompt_tokens": baseline["prompt_tokens"],
            "response_tokens": len(baseline["generated_tokens"]),
            "generated_tokens": list(baseline["generated_tokens"]),
        }

    result = capture_and_gate(
        StubTeacher(), img, "Free OCR.", 64, tmp_path / "out",
        decode_fn=matching_candidate,
    )
    assert result.passed
    assert (tmp_path / "out" / "candidate.json").exists()

    def diverging_candidate(baseline):
        tokens = list(baseline["generated_tokens"])
        tokens[2] = 999
        out = matching_candidate(baseline)
        out["generated_tokens"] = tokens
        return out

    result = capture_and_gate(
        StubTeacher(), img, "Free OCR.", 64, tmp_path / "out2",
        decode_fn=diverging_candidate,
    )
    assert not result.passed
    assert result.first_divergence == 2
    assert result.expected_token == 7
    assert result.actual_token == 999


def test_gate_trims_stop_tokens(tmp_path):
    """Trailing stop ids (BOS/EOS 1, 100001) must not fail the gate —
    mirrors _strict_compare's trim (orchestrator.py:470-480)."""
    img = tmp_path / "page.png"
    img.write_bytes(b"x")
    teacher = StubTeacher(generated=[5, 6, 100001])

    def candidate(baseline):
        return {
            "rendered_prompt": baseline["rendered_prompt"],
            "generated_tokens": [5, 6],
        }

    result = capture_and_gate(
        teacher, img, "p", 64, tmp_path / "out", decode_fn=candidate
    )
    assert result.passed


def test_cli_capture_subcommand_wired():
    """The bench CLI exposes `capture` with the documented flags."""
    from dsocr_tpu.bench.cli import main

    with pytest.raises(SystemExit):
        main(["capture", "--help"])


def test_run_candidate_writes_artifact(tmp_path):
    base = tmp_path / "baseline.json"
    base.write_text(json.dumps({
        "model_id": "deepseek-ocr", "image": "x.png", "prompt": "p",
        "rendered_prompt": "<image>\np", "max_new_tokens": 4,
        "generated_tokens": [1, 2],
    }))
    out = run_candidate(base, tmp_path / "cand.json", lambda b: {
        "generated_tokens": b["generated_tokens"],
        "rendered_prompt": b["rendered_prompt"],
    })
    assert json.loads(out.read_text())["generated_tokens"] == [1, 2]
