"""App configuration: TOML registry, override layering, virtual
filesystem, resource resolution (SURVEY.md §2.2)."""

from .app import (
    AppConfig,
    InferenceOverride,
    InferenceSettings,
    ModelEntry,
    ModelRegistry,
    ServerSettings,
    SnapshotEntry,
)
from .fs import VirtualFileSystem
from .resolver import ModelPaths, prepare_model_paths

__all__ = [
    "AppConfig",
    "InferenceOverride",
    "InferenceSettings",
    "ModelEntry",
    "ModelRegistry",
    "ServerSettings",
    "SnapshotEntry",
    "VirtualFileSystem",
    "ModelPaths",
    "prepare_model_paths",
]
