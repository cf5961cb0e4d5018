"""Config system: registry defaults, override layering, TOML round-trip,
VFS paths, resolver gating
(contracts: crates/config/tests/inference_overrides.rs, config.rs, fs.rs)."""

import pathlib

import pytest

from dsocr_tpu.config import (
    AppConfig,
    InferenceOverride,
    VirtualFileSystem,
    prepare_model_paths,
)
from dsocr_tpu.config.fs import Namespace
from dsocr_tpu.core import DecodeParametersPatch, ModelKind


def test_default_registry_entries():
    config = AppConfig()
    assert config.models.active == "deepseek-ocr"
    assert len(config.models.entries) == 14
    e = config.models.entries
    assert e["deepseek-ocr"].defaults.base_size == 1024
    assert e["deepseek-ocr"].defaults.image_size == 640
    assert e["deepseek-ocr"].defaults.crop_mode is True
    assert e["deepseek-ocr-2"].defaults.image_size == 768
    assert e["glm-ocr"].defaults.template == "plain"
    assert e["glm-ocr"].defaults.base_size == 336
    assert e["glm-ocr"].defaults.decode.max_new_tokens == 8192
    assert e["glm-ocr"].kind is ModelKind.GLM_OCR
    assert e["deepseek-ocr-q4k"].snapshot.dtype == "Q4_K"
    assert e["deepseek-ocr-q4k"].baseline_id == "deepseek-ocr"
    assert e["deepseek-ocr-q4k"].defaults.base_size == 1024
    assert e["paddleocr-vl-q8k"].snapshot.dtype == "Q8_0"


def test_override_layering_priority():
    config = AppConfig()
    # baseline → model defaults → CLI → request
    cli = InferenceOverride(
        image_size=512, decode=DecodeParametersPatch(max_new_tokens=100)
    )
    request = DecodeParametersPatch(max_new_tokens=33, temperature=0.7)
    settings = config.resolved_inference("deepseek-ocr", cli, request)
    assert settings.base_size == 1024  # model default
    assert settings.image_size == 512  # CLI wins over model default
    assert settings.decode.max_new_tokens == 33  # request wins over CLI
    assert settings.decode.temperature == 0.7


def test_glm_defaults_apply():
    settings = AppConfig().resolved_inference("glm-ocr")
    assert settings.template == "plain"
    assert settings.base_size == 336
    assert settings.crop_mode is False
    assert settings.decode.max_new_tokens == 8192


def test_toml_round_trip(tmp_path):
    config = AppConfig()
    config.models.active = "paddleocr-vl"
    config.inference.base_size = 800
    config.server.port = 9999
    path = tmp_path / "config.toml"
    path.write_text(config.to_toml())
    loaded = AppConfig.load(path)
    assert loaded.models.active == "paddleocr-vl"
    assert loaded.inference.base_size == 800
    assert loaded.server.port == 9999
    assert len(loaded.models.entries) == 14


def test_load_or_init_creates_file(tmp_path):
    path = tmp_path / "sub" / "config.toml"
    config = AppConfig.load_or_init(path)
    assert path.exists()
    assert config.models.active == "deepseek-ocr"
    # second load parses the created file
    again = AppConfig.load_or_init(path)
    assert again.models.active == "deepseek-ocr"


def test_vfs_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPSEEK_OCR_CONFIG_DIR", str(tmp_path / "cfg"))
    monkeypatch.setenv("DEEPSEEK_OCR_CACHE_DIR", str(tmp_path / "cache"))
    vfs = VirtualFileSystem()
    assert vfs.root(Namespace.CONFIG) == tmp_path / "cfg"
    assert vfs.model_weights("m") == tmp_path / "cache" / "models" / "m" / "model.safetensors"
    assert vfs.config_file().name == "config.toml"


def test_resolver_uses_local_files(tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPSEEK_OCR_CACHE_DIR", str(tmp_path))
    vfs = VirtualFileSystem()
    mdir = tmp_path / "models" / "paddleocr-vl"
    mdir.mkdir(parents=True)
    (mdir / "config.json").write_text("{}")
    (mdir / "tokenizer.json").write_text("{}")
    (mdir / "model.safetensors").write_bytes(b"x")
    paths = prepare_model_paths(
        AppConfig(), "paddleocr-vl", vfs=vfs, allow_download=False
    )
    assert paths.weights == mdir / "model.safetensors"
    assert paths.snapshot is None


def test_resolver_quantized_resolves_via_baseline(tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPSEEK_OCR_CACHE_DIR", str(tmp_path))
    vfs = VirtualFileSystem()
    base = tmp_path / "models" / "paddleocr-vl"
    base.mkdir(parents=True)
    (base / "config.json").write_text("{}")
    (base / "tokenizer.json").write_text("{}")
    (base / "model.safetensors").write_bytes(b"x")
    qdir = tmp_path / "models" / "paddleocr-vl-q6k"
    qdir.mkdir(parents=True)
    (qdir / "snapshot.dsq").write_bytes(b"s")
    paths = prepare_model_paths(
        AppConfig(), "paddleocr-vl-q6k", vfs=vfs, allow_download=False
    )
    assert paths.weights == base / "model.safetensors"  # via baseline_id
    assert paths.snapshot == qdir / "snapshot.dsq"


def test_resolver_snapshot_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPSEEK_OCR_CACHE_DIR", str(tmp_path))
    snap = tmp_path / "custom.dsq"
    snap.write_bytes(b"s")
    monkeypatch.setenv("DEEPSEEK_OCR_SNAPSHOT_OVERRIDE", str(snap))
    vfs = VirtualFileSystem()
    base = tmp_path / "models" / "paddleocr-vl"
    base.mkdir(parents=True)
    (base / "tokenizer.json").write_text("{}")
    (base / "model.safetensors").write_bytes(b"x")
    paths = prepare_model_paths(
        AppConfig(), "paddleocr-vl-q6k", vfs=vfs, allow_download=False
    )
    assert paths.snapshot == snap


def test_resolver_unknown_model():
    with pytest.raises(KeyError):
        prepare_model_paths(AppConfig(), "nope", allow_download=False)


def test_assets_manifest_tables():
    from dsocr_tpu.assets import MODEL_ASSETS, QUANTIZED_MODEL_ASSETS, baseline_model_id

    assert MODEL_ASSETS["deepseek-ocr"].repo_id == "deepseek-ai/DeepSeek-OCR"
    assert MODEL_ASSETS["dots-ocr"].weights.endswith(".index.json")
    assert MODEL_ASSETS["glm-ocr"].preprocessor == "preprocessor_config.json"
    assert len(QUANTIZED_MODEL_ASSETS) == 9
    assert baseline_model_id("dots-ocr-q6k") == "dots-ocr"
    assert baseline_model_id("dots-ocr") == "dots-ocr"
