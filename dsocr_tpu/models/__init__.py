"""Model families: DeepSeek-OCR (v1/v2), PaddleOCR-VL, DotsOCR, GLM-OCR.

Each family exposes a config dataclass, parameter init/load functions
(pure pytrees — no framework module state), jitted forward functions, and
an engine class implementing the `dsocr_tpu.core.OcrEngine` protocol.
"""
