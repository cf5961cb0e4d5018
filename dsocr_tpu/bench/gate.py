"""Strict token-level gating.

Mirrors benchsuite/orchestrator.py:456-521 (_strict_compare): exact
token-ID equality after trimming trailing stop tokens, plus
rendered-prompt equality. Artifacts are the CLI's --output-json schema
({text, prompt_tokens, response_tokens, generated_tokens,
rendered_prompt}).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import List, Optional, Sequence


@dataclasses.dataclass
class GateResult:
    passed: bool
    first_divergence: Optional[int] = None
    expected_token: Optional[int] = None
    actual_token: Optional[int] = None
    detail: str = ""

    def to_json(self) -> dict:
        return dataclasses.asdict(self)


def trim_stop_tokens(tokens: Sequence[int], stop_ids: Sequence[int]) -> List[int]:
    out = list(tokens)
    while out and out[-1] in stop_ids:
        out.pop()
    return out


def strict_compare(
    baseline_tokens: Sequence[int],
    candidate_tokens: Sequence[int],
    stop_ids: Sequence[int] = (1, 100001),
    baseline_prompt: Optional[str] = None,
    candidate_prompt: Optional[str] = None,
) -> GateResult:
    if (
        baseline_prompt is not None
        and candidate_prompt is not None
        and baseline_prompt != candidate_prompt
    ):
        return GateResult(passed=False, detail="rendered prompts differ")
    base = trim_stop_tokens(baseline_tokens, stop_ids)
    cand = trim_stop_tokens(candidate_tokens, stop_ids)
    for idx, (b, c) in enumerate(zip(base, cand)):
        if b != c:
            return GateResult(
                passed=False,
                first_divergence=idx,
                expected_token=b,
                actual_token=c,
                detail=f"token divergence at index {idx}",
            )
    if len(base) != len(cand):
        idx = min(len(base), len(cand))
        return GateResult(
            passed=False,
            first_divergence=idx,
            detail=f"length mismatch: baseline {len(base)} vs candidate {len(cand)}",
        )
    return GateResult(passed=True, detail=f"{len(base)} tokens identical")


def mismatch_rate(
    baseline_tokens: Sequence[int], candidate_tokens: Sequence[int]
) -> float:
    """Fraction of positions that differ (the ≤1% north-star check)."""
    n = max(len(baseline_tokens), len(candidate_tokens), 1)
    same = sum(
        1 for b, c in zip(baseline_tokens, candidate_tokens) if b == c
    )
    return 1.0 - same / n


def gate_files(
    baseline_path: pathlib.Path,
    candidate_path: pathlib.Path,
    stop_ids: Sequence[int] = (1, 100001),
) -> GateResult:
    baseline = json.loads(pathlib.Path(baseline_path).read_text())
    candidate = json.loads(pathlib.Path(candidate_path).read_text())
    return strict_compare(
        baseline.get("generated_tokens", baseline.get("tokens", [])),
        candidate.get("generated_tokens", candidate.get("tokens", [])),
        stop_ids=stop_ids,
        baseline_prompt=baseline.get("rendered_prompt"),
        candidate_prompt=candidate.get("rendered_prompt"),
    )
