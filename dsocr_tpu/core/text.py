"""Prompt rendering and output normalization.

Parity with ``crates/core/src/inference.rs:212-233``.
"""

from __future__ import annotations

from .benchmark import Timer
from .conversation import get_conv_template


def render_prompt(template: str, system_prompt: str, raw_prompt: str) -> str:
    """Render a prompt via the configured conversation template: system
    message set, one User turn with the raw prompt, one empty Assistant
    turn (generation point)."""
    timer = Timer("prompt.render")
    conv = get_conv_template(template)
    if conv is None:
        raise ValueError(f"unknown conversation template {template}")
    conv.set_system_message(system_prompt)
    conv.reset_messages()
    conv.append_message("User", raw_prompt)
    conv.append_message("Assistant", None)
    prompt = conv.get_prompt()
    timer.finish(chars=len(prompt))
    return prompt


def normalize_text(s: str) -> str:
    """Strip sentinel end-of-sentence token and CRLF line endings."""
    return s.replace("\r\n", "\n").replace("<｜end▁of▁sentence｜>", "").strip()
