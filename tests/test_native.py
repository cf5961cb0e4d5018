"""Native C++ resampler: bit-exactness vs Pillow, fused normalize."""

import numpy as np
import pytest
from PIL import Image

from dsocr_tpu.native import (
    native_available,
    resize_bicubic_native,
    resize_normalize_chw_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


@pytest.mark.parametrize("src,dst", [((64, 48), (32, 32)), ((16, 16), (64, 40)), ((37, 53), (128, 96))])
def test_native_resize_bit_exact_vs_pillow(src, dst):
    rng = np.random.default_rng(hash(src + dst) % (2**32))
    img = rng.integers(0, 256, (*src, 3), dtype=np.uint8)
    ours = resize_bicubic_native(img, dst[1], dst[0])
    pil = np.asarray(Image.fromarray(img).resize((dst[1], dst[0]), Image.Resampling.BICUBIC))
    np.testing.assert_array_equal(ours, pil)


def test_native_fused_normalize_matches_composed():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    fused = resize_normalize_chw_native(img, 64, 48)
    resized = np.asarray(Image.fromarray(img).resize((64, 48), Image.Resampling.BICUBIC))
    expected = (np.transpose(resized, (2, 0, 1)).astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6)


def test_native_identity_size_skips_resize():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    fused = resize_normalize_chw_native(img, 8, 8)
    expected = (np.transpose(img, (2, 0, 1)).astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6)


def test_prebuilt_lib_without_source_still_loads(tmp_path, monkeypatch):
    """Wheel/container installs carry the prebuilt .so but not the .cpp;
    the loader must use the cached library instead of failing the
    staleness check on a missing source file."""
    import shutil

    from dsocr_tpu.native import resample as mod

    lib = mod._load()
    assert lib is not None
    src_lib = mod._build_dir() / "libdsocr_resample.so"
    cache = tmp_path / "native-cache"
    cache.mkdir()
    shutil.copy2(src_lib, cache / "libdsocr_resample.so")
    monkeypatch.setenv("DSOCR_NATIVE_CACHE", str(cache))
    monkeypatch.setattr(mod, "_SOURCE", tmp_path / "missing" / "resample.cpp")
    monkeypatch.setattr(mod, "_LIB", None)
    monkeypatch.setattr(mod, "_FAILED", False)
    assert mod._load() is not None

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    ours = mod.resize_bicubic_native(img, 16, 12)
    pil = np.asarray(
        Image.fromarray(img).resize((16, 12), Image.Resampling.BICUBIC)
    )
    np.testing.assert_array_equal(ours, pil)
