"""Virtual filesystem: namespaced config/cache roots.

Parity with crates/config/src/fs.rs: Config and Cache namespaces resolve
to platform dirs or the DEEPSEEK_OCR_CONFIG_DIR / DEEPSEEK_OCR_CACHE_DIR
env overrides; model assets live under
``models/<id>/{config.json,tokenizer.json,model.safetensors,snapshot.dsq}``.
"""

from __future__ import annotations

import enum
import os
import pathlib
from typing import Optional


class Namespace(enum.Enum):
    CONFIG = "config"
    CACHE = "cache"


APP_DIR = "deepseek-ocr"


class VirtualFileSystem:
    def __init__(
        self,
        config_root: Optional[pathlib.Path] = None,
        cache_root: Optional[pathlib.Path] = None,
    ):
        self._config_root = config_root or self._default_root(Namespace.CONFIG)
        self._cache_root = cache_root or self._default_root(Namespace.CACHE)

    @staticmethod
    def _default_root(ns: Namespace) -> pathlib.Path:
        if ns is Namespace.CONFIG:
            env = os.environ.get("DEEPSEEK_OCR_CONFIG_DIR")
            if env:
                return pathlib.Path(env)
            xdg = os.environ.get("XDG_CONFIG_HOME")
            base = pathlib.Path(xdg) if xdg else pathlib.Path.home() / ".config"
            return base / APP_DIR
        env = os.environ.get("DEEPSEEK_OCR_CACHE_DIR")
        if env:
            return pathlib.Path(env)
        xdg = os.environ.get("XDG_CACHE_HOME")
        base = pathlib.Path(xdg) if xdg else pathlib.Path.home() / ".cache"
        return base / APP_DIR

    def root(self, ns: Namespace) -> pathlib.Path:
        return self._config_root if ns is Namespace.CONFIG else self._cache_root

    def resolve(self, ns: Namespace, *parts: str) -> pathlib.Path:
        return self.root(ns).joinpath(*parts)

    def ensure_dir(self, ns: Namespace, *parts: str) -> pathlib.Path:
        path = self.resolve(ns, *parts)
        path.mkdir(parents=True, exist_ok=True)
        return path

    # -- model asset layout -------------------------------------------------

    def config_file(self) -> pathlib.Path:
        return self.resolve(Namespace.CONFIG, "config.toml")

    def model_dir(self, model_id: str) -> pathlib.Path:
        return self.resolve(Namespace.CACHE, "models", model_id)

    def model_config(self, model_id: str) -> pathlib.Path:
        return self.model_dir(model_id) / "config.json"

    def model_tokenizer(self, model_id: str) -> pathlib.Path:
        return self.model_dir(model_id) / "tokenizer.json"

    def model_weights(self, model_id: str) -> pathlib.Path:
        return self.model_dir(model_id) / "model.safetensors"

    def model_snapshot(self, model_id: str) -> pathlib.Path:
        return self.model_dir(model_id) / "snapshot.dsq"

    def model_preprocessor(self, model_id: str) -> pathlib.Path:
        return self.model_dir(model_id) / "preprocessor_config.json"
