"""Safetensors checkpoint access with sharded-index support.

Equivalent of the reference's mmapped VarBuilder
(infer-deepseek/src/model/mod.rs:981-1052) and DotsOCR's sharded loads
(infer-dots/src/model.rs:33-36): a name→tensor view over one file or a
`model.safetensors.index.json` shard set, loaded lazily as NumPy arrays.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Iterator, List, Optional

import numpy as np


class CheckpointReader:
    def __init__(self, weights_path: pathlib.Path):
        from safetensors import safe_open

        self._safe_open = safe_open
        weights_path = pathlib.Path(weights_path)
        self._files: Dict[str, pathlib.Path] = {}
        if weights_path.suffix == ".json" or weights_path.name.endswith(
            ".index.json"
        ):
            index = json.loads(weights_path.read_text())
            base = weights_path.parent
            for name, shard in index["weight_map"].items():
                self._files[name] = base / shard
        else:
            index_candidate = weights_path.parent / (
                weights_path.name + ".index.json"
            )
            if not weights_path.exists() and index_candidate.exists():
                return self.__init__(index_candidate)
            with self._safe_open(str(weights_path), framework="np") as f:
                for name in f.keys():
                    self._files[name] = weights_path
        self._handles: Dict[pathlib.Path, object] = {}

    def _handle(self, path: pathlib.Path):
        if path not in self._handles:
            self._handles[path] = self._safe_open(str(path), framework="np")
        return self._handles[path]

    def keys(self) -> List[str]:
        return list(self._files.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._files

    def get(self, name: str, dtype=None) -> np.ndarray:
        if name not in self._files:
            raise KeyError(f"tensor {name!r} not in checkpoint")
        arr = self._handle(self._files[name]).get_tensor(name)
        arr = _decode_ml_dtypes(arr)
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr

    def get_optional(self, name: str, dtype=None) -> Optional[np.ndarray]:
        return self.get(name, dtype) if name in self._files else None

    def iter_prefix(self, prefix: str) -> Iterator[str]:
        for name in self._files:
            if name.startswith(prefix):
                yield name


def _decode_ml_dtypes(arr: np.ndarray) -> np.ndarray:
    """safetensors numpy framework returns bf16 as uint16 views on some
    versions; normalize through ml_dtypes when needed."""
    if arr.dtype == np.uint16:
        import ml_dtypes

        return arr.view(ml_dtypes.bfloat16)
    return arr
