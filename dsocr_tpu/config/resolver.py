"""Resource resolution: ensure config/tokenizer/weights/snapshot exist
locally, downloading through the assets layer when missing.

Parity with crates/config/src/resource_resolver.rs: quantized model ids
resolve config/tokenizer/weights through their `baseline_id`; the
DEEPSEEK_OCR_SNAPSHOT_OVERRIDE env var points at a local snapshot.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
from typing import Optional

from .app import AppConfig, ModelEntry
from .fs import VirtualFileSystem


@dataclasses.dataclass
class ModelPaths:
    model_id: str
    config: Optional[pathlib.Path]
    tokenizer: pathlib.Path
    weights: Optional[pathlib.Path]
    snapshot: Optional[pathlib.Path]
    preprocessor: Optional[pathlib.Path]


def prepare_model_paths(
    config: AppConfig,
    model_id: str,
    vfs: Optional[VirtualFileSystem] = None,
    allow_download: bool = True,
) -> ModelPaths:
    vfs = vfs or VirtualFileSystem()
    entry = config.models.entries.get(model_id)
    if entry is None:
        raise KeyError(f"model `{model_id}` not in registry")

    base_id = entry.baseline_id or model_id
    is_quantized = entry.snapshot is not None

    def resolve(kind: str, explicit, default_path) -> Optional[pathlib.Path]:
        if explicit is not None:
            return pathlib.Path(explicit)
        if default_path.exists():
            return default_path
        if allow_download:
            from ..assets import ensure_model_asset

            downloaded = ensure_model_asset(base_id, kind, default_path)
            if downloaded is not None:
                return downloaded
        return None

    config_path = resolve("config", entry.config, vfs.model_config(base_id))
    tokenizer_path = resolve("tokenizer", entry.tokenizer, vfs.model_tokenizer(base_id))
    if tokenizer_path is None:
        raise FileNotFoundError(
            f"tokenizer for `{model_id}` not found at "
            f"{vfs.model_tokenizer(base_id)} and download unavailable"
        )

    snapshot_path: Optional[pathlib.Path] = None
    weights_path: Optional[pathlib.Path] = None
    override = os.environ.get("DEEPSEEK_OCR_SNAPSHOT_OVERRIDE")
    if is_quantized:
        if override:
            snapshot_path = pathlib.Path(override)
        else:
            candidate = vfs.model_snapshot(model_id)
            if candidate.exists():
                snapshot_path = candidate
            elif allow_download:
                from ..assets import ensure_model_asset

                snapshot_path = ensure_model_asset(model_id, "snapshot", candidate)
        weights_path = resolve("weights", entry.weights, vfs.model_weights(base_id))
    else:
        weights_path = resolve("weights", entry.weights, vfs.model_weights(base_id))
        if weights_path is None:
            raise FileNotFoundError(
                f"weights for `{model_id}` not found at "
                f"{vfs.model_weights(base_id)} and download unavailable"
            )

    preprocessor = vfs.model_preprocessor(base_id)
    return ModelPaths(
        model_id=model_id,
        config=config_path,
        tokenizer=tokenizer_path,
        weights=weights_path,
        snapshot=snapshot_path,
        preprocessor=preprocessor if preprocessor.exists() else None,
    )
