"""DotsOCR: DotsVision ViT (packed frames, 2D rotary, SwiGLU) + Qwen2
decoder. Reference: crates/infer-dots (SURVEY.md §2.6)."""

from .config import DotsConfig, DotsVisionConfig, DotsTextConfig
from .engine import DotsOcrEngine

__all__ = ["DotsConfig", "DotsVisionConfig", "DotsTextConfig", "DotsOcrEngine"]
