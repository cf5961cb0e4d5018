"""PaddleOCR-VL teacher (best-effort: the reference disables the python
baseline for this family, benchsuite/models/paddle.py:15 — strict token
gating for paddle runs rust-vs-rust there). This teacher follows the
generic HF chat-template flow (base.py:620-655) so weights-day can still
produce a python-side artifact for diffing; expect to adjust the
processor call against the real PaddlePaddle/PaddleOCR-VL repo once."""

from __future__ import annotations

from ._chat import ChatTemplateTeacher


class HFPaddleTeacher(ChatTemplateTeacher):
    model_id = "paddleocr-vl"
