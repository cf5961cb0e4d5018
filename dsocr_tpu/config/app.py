"""TOML application config with a built-in model registry and layered
overrides.

Parity with crates/config/src/config.rs: 14 registry entries (5 base
models + 9 quantized variants), per-model inference defaults
(deepseek-ocr: 1024/640/crop; deepseek-ocr-2: 1024/768/crop; glm-ocr:
plain template, 336/336, no crop, 8192 max tokens), and the override
priority chain: config baseline → per-model defaults → CLI flags →
(server only) per-request patch.
"""

from __future__ import annotations

import dataclasses
import pathlib
import tomllib
from typing import Any, Dict, Mapping, Optional

from ..core.engine import ModelKind
from ..core.params import DecodeParameters, DecodeParametersPatch


@dataclasses.dataclass
class SnapshotEntry:
    dtype: str = ""


@dataclasses.dataclass
class InferenceOverride:
    """Optional-field overlay for InferenceSettings (config.rs:509-556)."""

    device: Optional[str] = None
    precision: Optional[str] = None
    template: Optional[str] = None
    base_size: Optional[int] = None
    image_size: Optional[int] = None
    crop_mode: Optional[bool] = None
    decode: DecodeParametersPatch = dataclasses.field(
        default_factory=DecodeParametersPatch
    )

    def fill_missing_vision(self, defaults: "InferenceOverride") -> None:
        if self.base_size is None:
            self.base_size = defaults.base_size
        if self.image_size is None:
            self.image_size = defaults.image_size
        if self.crop_mode is None:
            self.crop_mode = defaults.crop_mode

    @classmethod
    def from_mapping(cls, data: Mapping[str, Any]) -> "InferenceOverride":
        fields = {f.name for f in dataclasses.fields(cls)} - {"decode"}
        kwargs = {k: v for k, v in data.items() if k in fields}
        return cls(decode=DecodeParametersPatch.from_mapping(data), **kwargs)


@dataclasses.dataclass
class InferenceSettings:
    device: str = "tpu"
    precision: Optional[str] = None
    template: str = "plain"
    base_size: int = 1024
    image_size: int = 640
    crop_mode: bool = True
    decode: DecodeParameters = dataclasses.field(default_factory=DecodeParameters)

    def apply(self, override: InferenceOverride) -> "InferenceSettings":
        if override.device is not None:
            self.device = override.device
        if override.precision is not None:
            self.precision = override.precision
        if override.template is not None:
            self.template = override.template
        if override.base_size is not None:
            self.base_size = override.base_size
        if override.image_size is not None:
            self.image_size = override.image_size
        if override.crop_mode is not None:
            self.crop_mode = override.crop_mode
        self.decode += override.decode
        return self

    def copy(self) -> "InferenceSettings":
        return dataclasses.replace(
            self, decode=dataclasses.replace(self.decode)
        )


@dataclasses.dataclass
class ModelEntry:
    kind: ModelKind = ModelKind.DEEPSEEK
    config: Optional[pathlib.Path] = None
    tokenizer: Optional[pathlib.Path] = None
    weights: Optional[pathlib.Path] = None
    snapshot: Optional[SnapshotEntry] = None
    baseline_id: Optional[str] = None  # quantized ids resolve through this
    defaults: InferenceOverride = dataclasses.field(default_factory=InferenceOverride)


def _deepseek_ocr1_entry() -> ModelEntry:
    return ModelEntry(
        kind=ModelKind.DEEPSEEK,
        defaults=InferenceOverride(base_size=1024, image_size=640, crop_mode=True),
    )


def _deepseek_ocr2_entry() -> ModelEntry:
    return ModelEntry(
        kind=ModelKind.DEEPSEEK,
        defaults=InferenceOverride(base_size=1024, image_size=768, crop_mode=True),
    )


def _glm_ocr_entry() -> ModelEntry:
    return ModelEntry(
        kind=ModelKind.GLM_OCR,
        defaults=InferenceOverride(
            template="plain",
            base_size=336,
            image_size=336,
            crop_mode=False,
            decode=DecodeParametersPatch(
                max_new_tokens=8192,
                do_sample=False,
                temperature=0.0,
                top_p=1.0,
                repetition_penalty=1.0,
                seed=0,
            ),
        ),
    )


def _quantized_entry(kind: ModelKind, dtype: str, baseline: str) -> ModelEntry:
    entry = ModelEntry(kind=kind, snapshot=SnapshotEntry(dtype=dtype), baseline_id=baseline)
    if baseline == "deepseek-ocr":
        entry.defaults = InferenceOverride(base_size=1024, image_size=640, crop_mode=True)
    return entry


def default_model_entries() -> Dict[str, ModelEntry]:
    return {
        "deepseek-ocr": _deepseek_ocr1_entry(),
        "deepseek-ocr-2": _deepseek_ocr2_entry(),
        "paddleocr-vl": ModelEntry(kind=ModelKind.PADDLE_OCR_VL),
        "dots-ocr": ModelEntry(kind=ModelKind.DOTS_OCR),
        "glm-ocr": _glm_ocr_entry(),
        "deepseek-ocr-q4k": _quantized_entry(ModelKind.DEEPSEEK, "Q4_K", "deepseek-ocr"),
        "deepseek-ocr-q6k": _quantized_entry(ModelKind.DEEPSEEK, "Q6_K", "deepseek-ocr"),
        "deepseek-ocr-q8k": _quantized_entry(ModelKind.DEEPSEEK, "Q8_0", "deepseek-ocr"),
        "paddleocr-vl-q4k": _quantized_entry(ModelKind.PADDLE_OCR_VL, "Q4_K", "paddleocr-vl"),
        "paddleocr-vl-q6k": _quantized_entry(ModelKind.PADDLE_OCR_VL, "Q6_K", "paddleocr-vl"),
        "paddleocr-vl-q8k": _quantized_entry(ModelKind.PADDLE_OCR_VL, "Q8_0", "paddleocr-vl"),
        "dots-ocr-q4k": _quantized_entry(ModelKind.DOTS_OCR, "Q4_K", "dots-ocr"),
        "dots-ocr-q6k": _quantized_entry(ModelKind.DOTS_OCR, "Q6_K", "dots-ocr"),
        "dots-ocr-q8k": _quantized_entry(ModelKind.DOTS_OCR, "Q8_0", "dots-ocr"),
    }


@dataclasses.dataclass
class ModelRegistry:
    active: str = "deepseek-ocr"
    entries: Dict[str, ModelEntry] = dataclasses.field(
        default_factory=default_model_entries
    )


@dataclasses.dataclass
class ServerSettings:
    host: str = "0.0.0.0"
    port: int = 8000


@dataclasses.dataclass
class AppConfig:
    models: ModelRegistry = dataclasses.field(default_factory=ModelRegistry)
    inference: InferenceSettings = dataclasses.field(default_factory=InferenceSettings)
    server: ServerSettings = dataclasses.field(default_factory=ServerSettings)

    # -- layering ---------------------------------------------------------

    def resolved_inference(
        self,
        model_id: Optional[str] = None,
        cli: Optional[InferenceOverride] = None,
        request: Optional[DecodeParametersPatch] = None,
    ) -> InferenceSettings:
        """Priority chain (config.rs:330-376): baseline → model defaults
        → CLI flags → request patch."""
        settings = self.inference.copy()
        model_id = model_id or self.models.active
        entry = self.models.entries.get(model_id)
        if entry is not None:
            settings.apply(entry.defaults)
        if cli is not None:
            settings.apply(cli)
        if request is not None:
            settings.decode += request
        return settings

    # -- TOML io ------------------------------------------------------------

    @classmethod
    def load(cls, path: pathlib.Path) -> "AppConfig":
        data = tomllib.loads(pathlib.Path(path).read_text())
        return cls.from_mapping(data)

    @classmethod
    def load_or_init(cls, path: pathlib.Path) -> "AppConfig":
        path = pathlib.Path(path)
        if path.exists():
            return cls.load(path)
        config = cls()
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(config.to_toml())
        return config

    @classmethod
    def from_mapping(cls, data: Mapping[str, Any]) -> "AppConfig":
        config = cls()
        models = data.get("models", {})
        if "active" in models:
            config.models.active = models["active"]
        for model_id, raw in (models.get("entries") or {}).items():
            entry = config.models.entries.get(model_id, ModelEntry())
            if "kind" in raw:
                entry.kind = ModelKind(raw["kind"])
            for key in ("config", "tokenizer", "weights"):
                if raw.get(key):
                    setattr(entry, key, pathlib.Path(raw[key]))
            if raw.get("baseline_id"):
                entry.baseline_id = raw["baseline_id"]
            if isinstance(raw.get("snapshot"), Mapping):
                entry.snapshot = SnapshotEntry(dtype=raw["snapshot"].get("dtype", ""))
            if isinstance(raw.get("defaults"), Mapping):
                entry.defaults = InferenceOverride.from_mapping(raw["defaults"])
            config.models.entries[model_id] = entry
        if isinstance(data.get("inference"), Mapping):
            inf = data["inference"]
            override = InferenceOverride.from_mapping(inf)
            config.inference.apply(override)
            # baseline decode params come from flattened keys
        if isinstance(data.get("server"), Mapping):
            config.server.host = data["server"].get("host", config.server.host)
            config.server.port = data["server"].get("port", config.server.port)
        return config

    def to_toml(self) -> str:
        lines = []
        lines.append("[models]")
        lines.append(f'active = "{self.models.active}"')
        lines.append("")
        lines.append("[inference]")
        inf = self.inference
        lines.append(f'device = "{inf.device}"')
        if inf.precision:
            lines.append(f'precision = "{inf.precision}"')
        lines.append(f'template = "{inf.template}"')
        lines.append(f"base_size = {inf.base_size}")
        lines.append(f"image_size = {inf.image_size}")
        lines.append(f"crop_mode = {'true' if inf.crop_mode else 'false'}")
        d = inf.decode
        lines.append(f"max_new_tokens = {d.max_new_tokens}")
        lines.append(f"do_sample = {'true' if d.do_sample else 'false'}")
        lines.append(f"temperature = {d.temperature}")
        if d.top_p is not None:
            lines.append(f"top_p = {d.top_p}")
        if d.top_k is not None:
            lines.append(f"top_k = {d.top_k}")
        lines.append(f"repetition_penalty = {d.repetition_penalty}")
        if d.no_repeat_ngram_size is not None:
            lines.append(f"no_repeat_ngram_size = {d.no_repeat_ngram_size}")
        lines.append(f"use_cache = {'true' if d.use_cache else 'false'}")
        lines.append("")
        lines.append("[server]")
        lines.append(f'host = "{self.server.host}"')
        lines.append(f"port = {self.server.port}")
        lines.append("")
        for model_id, entry in self.models.entries.items():
            lines.append(f'[models.entries."{model_id}"]')
            lines.append(f'kind = "{entry.kind.value}"')
            if entry.baseline_id:
                lines.append(f'baseline_id = "{entry.baseline_id}"')
            for key in ("config", "tokenizer", "weights"):
                value = getattr(entry, key)
                if value:
                    lines.append(f'{key} = "{value}"')
            if entry.snapshot is not None:
                lines.append(f'[models.entries."{model_id}".snapshot]')
                lines.append(f'dtype = "{entry.snapshot.dtype}"')
            defaults = entry.defaults
            default_items = []
            for key in ("template", "base_size", "image_size", "crop_mode"):
                value = getattr(defaults, key)
                if value is not None:
                    if isinstance(value, bool):
                        default_items.append(f"{key} = {'true' if value else 'false'}")
                    elif isinstance(value, str):
                        default_items.append(f'{key} = "{value}"')
                    else:
                        default_items.append(f"{key} = {value}")
            for f in dataclasses.fields(defaults.decode):
                value = getattr(defaults.decode, f.name)
                if value is not None:
                    if isinstance(value, bool):
                        default_items.append(f"{f.name} = {'true' if value else 'false'}")
                    else:
                        default_items.append(f"{f.name} = {value}")
            if default_items:
                lines.append(f'[models.entries."{model_id}".defaults]')
                lines.extend(default_items)
            lines.append("")
        return "\n".join(lines)
