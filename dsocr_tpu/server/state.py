"""Server state: registry validation + lazy single-slot model cache.

Parity with crates/server/src/state.rs:30-245: one model resident at a
time, swapped on demand when a request names a different registry id; an
async lock serializes inference (continuous batching replaces this in
the batched scheduler path).
"""

from __future__ import annotations

import asyncio
import dataclasses
import pathlib
from typing import Any, Optional

from ..config import AppConfig, VirtualFileSystem, prepare_model_paths
from ..config.app import InferenceSettings
from ..core.engine import ModelKind, OcrEngine
from ..models.registry import load_engine
from ..utils.tokenizer import TokenizerAdapter, load_tokenizer
from .messages import ApiError


@dataclasses.dataclass
class LoadedModel:
    model_id: str
    engine: OcrEngine
    tokenizer: TokenizerAdapter
    kind: ModelKind


class AppState:
    def __init__(
        self,
        config: AppConfig,
        vfs: Optional[VirtualFileSystem] = None,
        allow_download: bool = True,
        max_seq_len: int = 8192,
        engine_factory=None,
        mesh=None,
        kv_quant=None,
        prefix_cache=None,
    ):
        self.config = config
        self.vfs = vfs or VirtualFileSystem()
        self.allow_download = allow_download
        self.max_seq_len = max_seq_len
        self.mesh = mesh
        self.kv_quant = kv_quant
        self.prefix_cache = prefix_cache
        self._engine_factory = engine_factory or self._default_factory
        self._loaded: Optional[LoadedModel] = None
        self._lock = asyncio.Lock()  # model swap + inference serialization
        # /metrics counters (the reference lists richer metrics as roadmap)
        self.metrics = {
            "requests_total": 0,
            "requests_failed": 0,
            "prompt_tokens_total": 0,
            "completion_tokens_total": 0,
            "decode_seconds_total": 0.0,
            "model_swaps_total": 0,
        }

    def validate_model(self, model_id: str) -> None:
        if model_id not in self.config.models.entries:
            raise ApiError(f"model `{model_id}` is not registered", status=400)

    def model_settings(self, model_id: str) -> InferenceSettings:
        return self.config.resolved_inference(model_id)

    def _default_factory(self, model_id: str) -> LoadedModel:
        entry = self.config.models.entries[model_id]
        paths = prepare_model_paths(
            self.config, model_id, vfs=self.vfs, allow_download=self.allow_download
        )
        settings = self.model_settings(model_id)
        engine = load_engine(
            entry.kind,
            config_path=paths.config,
            weights_path=paths.weights,
            snapshot_path=paths.snapshot,
            dtype=settings.precision,
            max_seq_len=self.max_seq_len,
            mesh=self.mesh,
            kv_quant=self.kv_quant,
        )
        tokenizer = load_tokenizer(paths.tokenizer)
        return LoadedModel(
            model_id=model_id, engine=engine, tokenizer=tokenizer, kind=entry.kind
        )

    async def ensure_model_loaded(self, model_id: str) -> LoadedModel:
        self.validate_model(model_id)
        async with self._lock:
            if self._loaded is None or self._loaded.model_id != model_id:
                loop = asyncio.get_running_loop()
                self._loaded = await loop.run_in_executor(
                    None, self._engine_factory, model_id
                )
                self.metrics["model_swaps_total"] += 1
                from .scheduler import BatchScheduler, ContinuousScheduler

                engine = self._loaded.engine
                if hasattr(engine, "make_slot_runner"):
                    # continuous batching: mid-flight joins, per-row
                    # params, streaming participation
                    self._scheduler = ContinuousScheduler(
                        engine, self._loaded.tokenizer,
                        prefix_cache=self.prefix_cache,
                    )
                else:
                    self._scheduler = BatchScheduler(
                        engine, self._loaded.tokenizer, lock=self._lock
                    )
            return self._loaded

    @property
    def scheduler(self):
        return getattr(self, "_scheduler", None)

    @property
    def lock(self) -> asyncio.Lock:
        return self._lock
