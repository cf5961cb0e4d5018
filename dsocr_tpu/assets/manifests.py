"""Static asset manifests (ref crates/assets/src/lib.rs:53-192)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class ModelAsset:
    id: str
    kind: str
    repo_id: str
    config: str = "config.json"
    tokenizer: str = "tokenizer.json"
    weights: str = "model.safetensors"
    preprocessor: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class QuantizedModelAsset:
    id: str
    kind: str
    baseline_id: str
    dtype: str
    repo_id: str
    filename: str


MODEL_ASSETS: Dict[str, ModelAsset] = {
    a.id: a
    for a in [
        ModelAsset(
            id="deepseek-ocr",
            kind="deepseek",
            repo_id="deepseek-ai/DeepSeek-OCR",
            weights="model-00001-of-000001.safetensors",
        ),
        ModelAsset(
            id="deepseek-ocr-2",
            kind="deepseek",
            repo_id="deepseek-ai/DeepSeek-OCR-2",
            weights="model-00001-of-000001.safetensors",
        ),
        ModelAsset(
            id="paddleocr-vl",
            kind="paddle_ocr_vl",
            repo_id="PaddlePaddle/PaddleOCR-VL",
        ),
        ModelAsset(
            id="dots-ocr",
            kind="dots_ocr",
            repo_id="rednote-hilab/dots.ocr",
            weights="model.safetensors.index.json",
            preprocessor="preprocessor_config.json",
        ),
        ModelAsset(
            id="glm-ocr",
            kind="glm_ocr",
            repo_id="zai-org/GLM-OCR",
            preprocessor="preprocessor_config.json",
        ),
    ]
}

QUANTIZED_MODEL_ASSETS: Dict[str, QuantizedModelAsset] = {
    a.id: a
    for a in [
        QuantizedModelAsset(
            "deepseek-ocr-q4k", "deepseek", "deepseek-ocr", "Q4_K",
            "TimmyOVO/deepseek-ocr.rs", "DeepSeek-OCR.Q4_K.dsq",
        ),
        QuantizedModelAsset(
            "deepseek-ocr-q6k", "deepseek", "deepseek-ocr", "Q6_K",
            "TimmyOVO/deepseek-ocr.rs", "DeepSeek-OCR.Q6_K.dsq",
        ),
        QuantizedModelAsset(
            "deepseek-ocr-q8k", "deepseek", "deepseek-ocr", "Q8_0",
            "TimmyOVO/deepseek-ocr.rs", "DeepSeek-OCR.Q8_0.dsq",
        ),
        QuantizedModelAsset(
            "paddleocr-vl-q4k", "paddle_ocr_vl", "paddleocr-vl", "Q4_K",
            "TimmyOVO/PaddleOCR-VL-Quantization", "PaddleOCR-VL.Q4_K.dsq",
        ),
        QuantizedModelAsset(
            "paddleocr-vl-q6k", "paddle_ocr_vl", "paddleocr-vl", "Q6_K",
            "TimmyOVO/PaddleOCR-VL-Quantization", "PaddleOCR-VL.Q6_K.dsq",
        ),
        QuantizedModelAsset(
            "paddleocr-vl-q8k", "paddle_ocr_vl", "paddleocr-vl", "Q8_0",
            "TimmyOVO/PaddleOCR-VL-Quantization", "PaddleOCR-VL.Q8_0.dsq",
        ),
        QuantizedModelAsset(
            "dots-ocr-q4k", "dots_ocr", "dots-ocr", "Q4_K",
            "TimmyOVO/dots.ocr-Quantization", "dots.ocr.Q4_K.dsq",
        ),
        QuantizedModelAsset(
            "dots-ocr-q6k", "dots_ocr", "dots-ocr", "Q6_K",
            "TimmyOVO/dots.ocr-Quantization", "dots.ocr.Q6_K.dsq",
        ),
        QuantizedModelAsset(
            "dots-ocr-q8k", "dots_ocr", "dots-ocr", "Q8_0",
            "TimmyOVO/dots.ocr-Quantization", "dots.ocr.Q8_0.dsq",
        ),
    ]
}


def baseline_model_id(model_id: str) -> str:
    q = QUANTIZED_MODEL_ASSETS.get(model_id)
    return q.baseline_id if q else model_id
