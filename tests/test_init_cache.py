"""Disk cache for random-init quantized host trees (utils/init_cache).

Bench processes on this machine pay ~15 min of single-core init+quantize
per run; the cache makes that a one-time cost. These tests pin (a) the
unit round-trip, (b) that a cache-hit engine skips decoder init entirely
and still decodes the same tokens as the engine that populated it."""

import numpy as np
import jax.numpy as jnp

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.utils.init_cache import cached_quant_init

VS = VisionSettings(64, 64, False)


class Tok:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


def _tree_equal(a, b):
    assert sorted(a) == sorted(b)
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_round_trip_and_single_build(tmp_path, monkeypatch):
    monkeypatch.setenv("DSOCR_INIT_CACHE", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return {
            "layers": {
                "codes": np.arange(12, dtype=np.int8).reshape(3, 4),
                "scales": np.linspace(0, 1, 3, dtype=np.float32),
            },
            "norm": np.float32(2.0),
        }

    first = cached_quant_init("fam", "cfg-repr", 0, "q8_0", True, build)
    second = cached_quant_init("fam", "cfg-repr", 0, "q8_0", True, build)
    assert calls == [1]  # second call served from disk
    _tree_equal(first, second)
    # any key component change misses
    cached_quant_init("fam", "cfg-repr", 1, "q8_0", True, build)
    assert calls == [1, 1]


def test_disabled_without_env(tmp_path, monkeypatch):
    monkeypatch.delenv("DSOCR_INIT_CACHE", raising=False)
    calls = []

    def build():
        calls.append(1)
        return {"x": np.ones(2)}

    cached_quant_init("fam", "cfg", 0, "q8_0", False, build)
    cached_quant_init("fam", "cfg", 0, "q8_0", False, build)
    assert calls == [1, 1]
    assert not list(tmp_path.iterdir())


def test_engine_cache_hit_skips_init_and_matches(tmp_path, monkeypatch):
    monkeypatch.setenv("DSOCR_INIT_CACHE", str(tmp_path))
    cfg = tiny_deepseek_config()
    kwargs = dict(dtype=jnp.float32, max_seq_len=512, seed=7,
                  quantize="q8_0", kv_quant="int8")
    cold = DeepseekOcrEngine(cfg, **kwargs)
    assert list(tmp_path.iterdir())  # populated

    # a hit must never touch the 3B-scale random init
    import dsocr_tpu.models.deepseek.engine as engine_mod

    def boom(*a, **k):
        raise AssertionError("decoder init ran despite a cache hit")

    monkeypatch.setattr(engine_mod, "init_deepseek_params", boom)
    warm = DeepseekOcrEngine(cfg, **kwargs)

    img = np.random.default_rng(0).integers(
        0, 255, (96, 96, 3), dtype=np.uint8
    )
    params = DecodeParameters(max_new_tokens=8)
    a = cold.decode(Tok(), "<image>\nocr", [img], VS, params)
    b = warm.decode(Tok(), "<image>\nocr", [img], VS, params)
    assert a.generated_tokens == b.generated_tokens
