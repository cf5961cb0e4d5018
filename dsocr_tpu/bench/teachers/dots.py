"""DotsOCR teacher (best-effort: the reference disables the python
baseline for this family, benchsuite/models/dots.py:15). Follows the
generic HF chat-template flow; the rednote-hilab/dots.ocr repo ships its
own processor via trust_remote_code."""

from __future__ import annotations

from ._chat import ChatTemplateTeacher


class HFDotsTeacher(ChatTemplateTeacher):
    model_id = "dots-ocr"
