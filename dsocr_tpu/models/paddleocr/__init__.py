"""PaddleOCR-VL: SigLIP vision tower + mlp_AR projector + Ernie decoder
with 3-axis M-RoPE. Reference: crates/infer-paddleocr (SURVEY.md §2.5)."""

from .config import PaddleVisionConfig, PaddleConfig
from .engine import PaddleOcrEngine

__all__ = ["PaddleVisionConfig", "PaddleConfig", "PaddleOcrEngine"]
