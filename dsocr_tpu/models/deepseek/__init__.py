"""DeepSeek-OCR (v1): SAM-ViT-B + CLIP-L dual vision towers, linear
projector with newline/view-separator tokens, DeepSeek-V2 MoE decoder.
Reference: crates/infer-deepseek (SURVEY.md §2.4)."""

from .config import DeepseekOcrConfig, DeepseekV2Config, SamParams, ClipParams
from .engine import DeepseekOcrEngine

__all__ = [
    "DeepseekOcrConfig",
    "DeepseekV2Config",
    "SamParams",
    "ClipParams",
    "DeepseekOcrEngine",
]
