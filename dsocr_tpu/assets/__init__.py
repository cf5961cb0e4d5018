"""Model asset manifests + download engine.

Parity with crates/assets: static per-model repo/file manifests
(HuggingFace ids, sharded-index support, preprocessor configs), nine
quantized `.dsq` snapshot assets, and provider failover (HuggingFace →
ModelScope) ordered by a latency probe. Downloads are best-effort: in
air-gapped environments every ensure_* returns None and callers fall
back to local paths.
"""

from .manifests import (
    MODEL_ASSETS,
    QUANTIZED_MODEL_ASSETS,
    ModelAsset,
    QuantizedModelAsset,
    baseline_model_id,
)
from .download import ensure_model_asset, download_file

__all__ = [
    "MODEL_ASSETS",
    "QUANTIZED_MODEL_ASSETS",
    "ModelAsset",
    "QuantizedModelAsset",
    "baseline_model_id",
    "ensure_model_asset",
    "download_file",
]
