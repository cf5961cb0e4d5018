"""GLM-OCR: GLM ViT (q/k-normed attention, conv downsample + gated
merger) + GLM text decoder (sandwich norms, partial interleaved M-RoPE),
hard-coded chat scaffold, greedy-only, multi-EOS.
Reference: crates/infer-glm (SURVEY.md §2.7)."""

from .config import GlmConfig, GlmTextConfig, GlmVisionConfig
from .engine import GlmOcrEngine

__all__ = ["GlmConfig", "GlmTextConfig", "GlmVisionConfig", "GlmOcrEngine"]
