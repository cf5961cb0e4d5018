"""Core runtime: engine protocol, decode parameters, conversation templates,
streaming deltas, sampling, bench timers.

Behavioral contract mirrors the reference crate ``crates/core`` (see
SURVEY.md §2.1); implementation is new, Python/JAX-first.
"""

from .params import (
    DecodeParameters,
    DecodeParametersPatch,
    VisionSettings,
)
from .engine import DecodeOutcome, ModelKind, ModelLoadArgs, OcrEngine
from .conversation import (
    ConversationTemplate,
    SeparatorStyle,
    get_conv_template,
    register_conv_template,
)
from .streaming import DeltaTracker, extract_delta
from .text import normalize_text, render_prompt

__all__ = [
    "DecodeParameters",
    "DecodeParametersPatch",
    "VisionSettings",
    "DecodeOutcome",
    "ModelKind",
    "ModelLoadArgs",
    "OcrEngine",
    "ConversationTemplate",
    "SeparatorStyle",
    "get_conv_template",
    "register_conv_template",
    "DeltaTracker",
    "extract_delta",
    "normalize_text",
    "render_prompt",
]
