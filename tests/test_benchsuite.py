"""Benchsuite gating semantics (contract: benchsuite/orchestrator.py)."""

import json

import pytest

from dsocr_tpu.bench.cli import main as bench_main
from dsocr_tpu.bench.gate import mismatch_rate, strict_compare, trim_stop_tokens


def test_trim_stop_tokens():
    assert trim_stop_tokens([5, 6, 1, 100001, 1], (1, 100001)) == [5, 6]
    assert trim_stop_tokens([1, 5], (1,)) == [1, 5]  # only trailing trimmed


def test_strict_compare_pass():
    r = strict_compare([1, 2, 3, 100001], [1, 2, 3], stop_ids=(100001,))
    assert r.passed


def test_strict_compare_divergence_index():
    r = strict_compare([1, 2, 3], [1, 9, 3])
    assert not r.passed
    assert r.first_divergence == 1
    assert r.expected_token == 2 and r.actual_token == 9


def test_strict_compare_length_mismatch():
    r = strict_compare([1, 2, 3], [1, 2])
    assert not r.passed and "length" in r.detail


def test_strict_compare_prompt_mismatch():
    r = strict_compare([1], [1], baseline_prompt="a", candidate_prompt="b")
    assert not r.passed and "prompt" in r.detail


def test_mismatch_rate():
    assert mismatch_rate([1, 2, 3, 4], [1, 2, 0, 4]) == 0.25


def test_gate_cli(tmp_path):
    base = tmp_path / "base.json"
    cand = tmp_path / "cand.json"
    base.write_text(json.dumps({"generated_tokens": [1, 2, 3], "rendered_prompt": "p"}))
    cand.write_text(json.dumps({"generated_tokens": [1, 2, 3, 100001], "rendered_prompt": "p"}))
    assert bench_main(["gate", "--baseline", str(base), "--candidate", str(cand)]) == 0
    cand.write_text(json.dumps({"generated_tokens": [1, 9], "rendered_prompt": "p"}))
    assert bench_main(["gate", "--baseline", str(base), "--candidate", str(cand)]) == 1


def test_matrix_gate_cli(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"generated_tokens": [1, 2]}))
    b.write_text(json.dumps({"generated_tokens": [1, 2]}))
    assert bench_main(["matrix-gate", f"{a}:{b}"]) == 0


def test_perf_history_compare(tmp_path):
    from dsocr_tpu.bench.perf import PerfEntry, compare_history, save_history

    history = tmp_path / "history.json"
    first = [PerfEntry("m", "bf16", {"decode.generate": 100.0}, 1.0, 10.0)]
    save_history(first, history)
    slower = [PerfEntry("m", "bf16", {"decode.generate": 150.0}, 1.5, 7.0)]
    report = compare_history(slower, history)
    assert report["regressions"]
    faster = [PerfEntry("m", "bf16", {"decode.generate": 50.0}, 0.5, 20.0)]
    report2 = compare_history(faster, history)
    assert report2["improvements"]


def test_perf_history_stage_rename_and_kv_axis(tmp_path):
    """(1) slot.prepare_inputs.overlapped folds into slot.prepare_inputs
    for comparison — the r3 stage rename must not read as a spurious
    regression/improvement pair (VERDICT r4 weak #6). (2) kv_quant is a
    distinct matrix key: an int8-KV cell never compares against the
    dense-KV cell's stages."""
    from dsocr_tpu.bench.perf import PerfEntry, compare_history, save_history

    history = tmp_path / "history.json"
    old = [
        PerfEntry("m", "bf16", {"slot.prepare_inputs": 100.0}, 1.0, 10.0, mode="serve"),
        PerfEntry("m", "bf16", {"slot.decode_chunk": 50.0}, 1.0, 10.0,
                  mode="serve", kv_quant="int8"),
    ]
    save_history(old, history)
    renamed = [
        PerfEntry(
            "m", "bf16",
            {"slot.prepare_inputs": 0.5, "slot.prepare_inputs.overlapped": 101.0},
            1.0, 10.0, mode="serve",
        )
    ]
    report = compare_history(renamed, history)
    assert not report["regressions"] and not report["improvements"]
    # a real regression in the int8 cell is still caught under its own key
    kv_slow = [
        PerfEntry("m", "bf16", {"slot.decode_chunk": 90.0}, 1.0, 10.0,
                  mode="serve", kv_quant="int8")
    ]
    report2 = compare_history(kv_slow, history)
    assert report2["regressions"]
