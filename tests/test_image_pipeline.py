"""Image preprocessing: Pillow-exactness, letterbox geometry, tiling
ratios, smart_resize budgets (contracts: infer-deepseek vision/resample.rs,
vision/preprocess.rs, model/mod.rs:2295-2347; infer-paddleocr
vision/preprocess.rs)."""

import numpy as np
import pytest
from PIL import Image

from dsocr_tpu.image import (
    PreprocessParams,
    build_global_view,
    dynamic_preprocess,
    image_to_tensor,
    preprocess_patches,
    resize_bicubic,
    resize_bicubic_numpy,
    round_ties_to_even,
    smart_resize,
    SmartResizeConfig,
)


def _random_image(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# -- resampler ---------------------------------------------------------------


@pytest.mark.parametrize(
    "src,dst",
    [
        ((64, 48), (32, 32)),  # downscale
        ((16, 16), (64, 40)),  # upscale
        ((37, 53), (128, 96)),  # odd sizes up
        ((100, 77), (13, 29)),  # odd sizes down
        ((8, 8), (8, 8)),  # identity-size
        ((1, 1), (4, 4)),  # degenerate tiny
    ],
)
def test_numpy_resampler_bit_exact_vs_pillow(src, dst):
    rng = np.random.default_rng(hash(src + dst) % (2**32))
    img = _random_image(rng, *src)
    ours = resize_bicubic_numpy(img, dst[1], dst[0])
    pil = np.asarray(
        Image.fromarray(img).resize((dst[1], dst[0]), Image.Resampling.BICUBIC)
    )
    np.testing.assert_array_equal(ours, pil)


def test_resampler_gradient_bit_exact():
    # Smooth gradients exercise coefficient normalization edge cases.
    y, x = np.mgrid[0:97, 0:61]
    img = np.stack([(x * 255 // 60), (y * 255 // 96), (x + y) % 256], axis=-1).astype(
        np.uint8
    )
    ours = resize_bicubic_numpy(img, 640, 480)
    pil = np.asarray(Image.fromarray(img).resize((640, 480), Image.Resampling.BICUBIC))
    np.testing.assert_array_equal(ours, pil)


def test_resize_zero_dims():
    img = _random_image(np.random.default_rng(0), 10, 10)
    assert resize_bicubic(img, 0, 5).shape == (5, 0, 3)


# -- rounding ---------------------------------------------------------------


@pytest.mark.parametrize(
    "value,expected",
    [
        (2.5, 2.0),
        (3.5, 4.0),
        (-2.5, -2.0),
        (-3.5, -4.0),
        (2.4, 2.0),
        (2.6, 3.0),
        (0.5, 0.0),
        (1.5, 2.0),
        (-0.5, 0.0),
    ],
)
def test_round_ties_to_even(value, expected):
    assert round_ties_to_even(value) == expected


# -- global view --------------------------------------------------------------


def test_global_view_landscape_letterbox():
    rng = np.random.default_rng(1)
    img = _random_image(rng, 100, 200)  # 2:1 landscape
    view = build_global_view(img, 64)
    assert view.shape == (64, 64, 3)
    # scaled to 64x32, centered vertically at y=16
    assert (view[0] == 127).all()  # top letterbox band is mean gray
    assert (view[15] == 127).all()
    assert not (view[32] == 127).all()  # content row
    assert (view[48:] == 127).all()


def test_global_view_square_fills():
    img = _random_image(np.random.default_rng(2), 50, 50)
    view = build_global_view(img, 64)
    # full-bleed resize, compare against direct bicubic
    np.testing.assert_array_equal(view, resize_bicubic(img, 64, 64))


def test_global_view_empty_image():
    view = build_global_view(np.zeros((0, 0, 3), dtype=np.uint8), 32)
    assert (view == 127).all()


def test_image_to_tensor_normalization():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 127]
    t = image_to_tensor(img)
    assert t.shape == (3, 2, 2)
    np.testing.assert_allclose(t[0, 0, 0], 1.0)
    np.testing.assert_allclose(t[1, 0, 0], -1.0)
    np.testing.assert_allclose(t[2, 0, 0], (127 / 255 - 0.5) / 0.5, rtol=1e-6)


# -- dynamic tiling ------------------------------------------------------------


def test_small_image_skips_crop():
    img = _random_image(np.random.default_rng(3), 100, 100)
    result = dynamic_preprocess(img, PreprocessParams.ocr1(1024, 640))
    assert result.tiles == []
    assert result.ratio == (1, 1)


def test_landscape_2to1_picks_2x1():
    img = _random_image(np.random.default_rng(4), 700, 1400)
    result = dynamic_preprocess(img, PreprocessParams.ocr1(1024, 640))
    assert result.ratio == (2, 1)
    assert len(result.tiles) == 2
    assert all(t.shape == (640, 640, 3) for t in result.tiles)


def test_portrait_1to3_picks_1x3():
    img = _random_image(np.random.default_rng(5), 1980, 660)
    result = dynamic_preprocess(img, PreprocessParams.ocr1(1024, 640))
    assert result.ratio == (1, 3)
    assert len(result.tiles) == 3


def test_ocr2_max_num_respected():
    img = _random_image(np.random.default_rng(6), 640, 645 * 9)
    result = dynamic_preprocess(img, PreprocessParams.ocr2(1024, 640))
    w, h = result.ratio
    assert 2 <= w * h <= 6


def test_thumbnail_appended():
    img = _random_image(np.random.default_rng(7), 700, 1400)
    result = dynamic_preprocess(
        img, PreprocessParams.ocr1(1024, 640), use_thumbnail=True
    )
    assert len(result.tiles) == 3  # 2 tiles + thumbnail
    np.testing.assert_array_equal(result.tiles[-1], resize_bicubic(img, 640, 640))


def test_tile_contents_match_resized_crops():
    img = _random_image(np.random.default_rng(8), 700, 1400)
    result = dynamic_preprocess(img, PreprocessParams.ocr1(1024, 640))
    resized = resize_bicubic(img, 1280, 640)
    np.testing.assert_array_equal(result.tiles[0], resized[:, :640])
    np.testing.assert_array_equal(result.tiles[1], resized[:, 640:])


# -- smart resize ---------------------------------------------------------------


def test_smart_resize_multiples_of_factor():
    h, w = smart_resize(1000, 700, 28)
    assert h % 28 == 0 and w % 28 == 0
    assert 147_384 <= h * w <= 2_822_400


def test_smart_resize_upscales_small():
    h, w = smart_resize(100, 100, 28)
    assert h * w >= 147_384


def test_smart_resize_downscales_large():
    h, w = smart_resize(4000, 4000, 28)
    assert h * w <= 2_822_400


def test_smart_resize_aspect_limit():
    with pytest.raises(ValueError):
        smart_resize(10, 4000, 28)


def test_smart_resize_tiny_side_clamped_to_factor():
    h, w = smart_resize(10, 2000, 28, min_pixels=1, max_pixels=10**9)
    assert h >= 28 and w >= 28


def test_preprocess_patches_shapes_and_ids():
    rng = np.random.default_rng(9)
    img = _random_image(rng, 400, 600)
    cfg = SmartResizeConfig()
    out = preprocess_patches(img, cfg)
    t, gh, gw = out.grid_thw
    assert t == 1
    assert out.patches.shape == (gh * gw, 3, 14, 14)
    assert out.height == gh * 14 and out.width == gw * 14
    np.testing.assert_array_equal(out.height_ids[:gw], np.zeros(gw))
    np.testing.assert_array_equal(out.width_ids[:gw], np.arange(gw))
    np.testing.assert_array_equal(out.position_ids, np.arange(gh * gw))


def test_preprocess_patches_ordering_matches_loop_spec():
    # Vectorized patchify must equal the reference's (gh, gw, c, py, px) loop.
    rng = np.random.default_rng(10)
    # factor = patch*merge = 28; use multiples so no resize happens
    img = _random_image(rng, 28, 2 * 28)
    cfg = SmartResizeConfig(min_pixels=1, max_pixels=10**9)
    out = preprocess_patches(img, cfg)
    _, gh, gw = out.grid_thw
    assert (gh, gw) == (2, 4)
    mean = np.array(cfg.image_mean, dtype=np.float32)
    std = np.array(cfg.image_std, dtype=np.float32)
    normalized = (img.astype(np.float32) / 255.0 - mean) / std
    expected = []
    for i in range(gh):
        for j in range(gw):
            for c in range(3):
                expected.append(
                    normalized[i * 14 : (i + 1) * 14, j * 14 : (j + 1) * 14, c]
                )
    expected = np.stack(expected).reshape(gh * gw, 3, 14, 14)
    np.testing.assert_allclose(out.patches, expected, rtol=1e-6, atol=1e-6)
