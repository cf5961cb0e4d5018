"""Benchsuite: token-level gating and performance matrices.

Python equivalent of the reference's benchsuite/ (SURVEY.md §2.10):
- gate: strict token-ID comparison between a candidate run and a
  baseline artifact (trailing stop tokens trimmed, rendered prompt must
  match exactly);
- perf: model×dtype matrix of stage timings with history comparison;
- matrix-gate: gate across a config matrix.
"""
