"""Content-only global-view upload + streamed wave prep.

The serving path ships only the letterboxed global view's CONTENT rows
over the host↔device link and re-pads the constant-127 margins inside
the tower jit (engine._tower pad arg). These tests pin:
  * the pad metadata matches the canvas (margins are exactly 127 and
    the content slice reproduces the canvas bit-exactly),
  * tower outputs are identical with and without content upload,
  * prefill_for_slots' streamed prep path (uploads overlapping host
    resample) produces packets identical to the sequential path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import VisionSettings
from dsocr_tpu.image import build_global_view, build_global_view_with_box
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


@pytest.fixture(scope="module")
def engine():
    return DeepseekOcrEngine(
        tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024
    )


def _img(seed, h, w):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_global_view_box_reconstructs_canvas():
    image = _img(0, 41, 100)  # wide: top/bottom margins
    canvas, (top, bottom, left, right) = build_global_view_with_box(image, 64)
    assert canvas.shape == (64, 64, 3)
    np.testing.assert_array_equal(canvas, build_global_view(image, 64))
    rebuilt = np.full_like(canvas, 127)
    content = canvas[top : 64 - bottom, left : 64 - right]
    rebuilt[top : 64 - bottom, left : 64 - right] = content
    np.testing.assert_array_equal(rebuilt, canvas)
    assert top + bottom > 0 and left == right == 0


def test_global_view_box_tall_image():
    image = _img(1, 120, 30)  # tall: left/right margins
    canvas, (top, bottom, left, right) = build_global_view_with_box(image, 64)
    assert left + right > 0 and top == bottom == 0
    pad_cols = np.concatenate(
        [canvas[:, :left], canvas[:, 64 - right :]], axis=1
    )
    assert (pad_cols == 127).all()


def test_tower_pad_matches_full_upload(engine):
    vin = engine.prepare_vision_input(
        _img(2, 50, 100), VisionSettings(base_size=64, image_size=64, crop_mode=False)
    )
    assert vin.global_pad is not None and any(vin.global_pad)
    top, bottom, left, right = vin.global_pad
    full = engine._tower_jitted(jnp.asarray(vin.global_pixels))
    G = vin.global_pixels.shape[2]
    content = vin.global_pixels[:, :, top : G - bottom, left : G - right]
    padded = engine._tower_jitted(jnp.asarray(content), pad=vin.global_pad)
    # the pixel tensors are bit-identical (margins == constant 127); the
    # tolerance is XLA fusing the pad into the patch conv, which changes
    # f32 reduction order (same bound as the pooled-vs-solo tower test)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(padded), rtol=2e-5, atol=2e-5
    )


def test_batched_embeddings_content_vs_full(engine, monkeypatch):
    settings = VisionSettings(base_size=64, image_size=64, crop_mode=True)
    vins = [
        engine.prepare_vision_input(_img(s, 70, 140), settings) for s in range(3, 7)
    ]
    monkeypatch.setenv("DSOCR_CONTENT_UPLOAD", "0")
    full = engine._compute_image_embeddings_batched(vins)
    monkeypatch.setenv("DSOCR_CONTENT_UPLOAD", "1")
    sliced = engine._compute_image_embeddings_batched(vins)
    for a, b in zip(full, sliced):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_prefill_for_slots_streamed_matches_sequential(engine, monkeypatch):
    settings = VisionSettings(base_size=64, image_size=64, crop_mode=True)
    requests = [
        ("<image>\nOCR.", [_img(10 + i, 70, 140)], settings) for i in range(5)
    ]
    tok = FakeTokenizer()
    monkeypatch.setenv("DSOCR_STREAM_PREP", "0")
    seq = engine.prefill_for_slots(tok, requests)
    monkeypatch.setenv("DSOCR_STREAM_PREP", "1")
    streamed = engine.prefill_for_slots(tok, requests)
    assert len(seq) == len(streamed)
    for a, b in zip(seq, streamed):
        assert a.keys() == b.keys()
        np.testing.assert_array_equal(
            np.asarray(a["prompt_ids"]), np.asarray(b["prompt_ids"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["logits"]), np.asarray(b["logits"])
        )


def test_bucket_margins_canonical_split_bounds_compile_keys():
    """The bucketed pad tuple is a STATIC jit arg of the tower — its
    distinct-value count is the tower compile-key count. The split must
    depend (almost) only on the bucketed span, not the exact content
    offset: over every content height of a centered letterbox at G=1024
    there must be at most ~2 tuples per span bucket (ADVICE r3, high)."""
    from dsocr_tpu.models.deepseek.engine import _bucket_margins

    G = 1024
    mult = 64
    tuples = set()
    spans = set()
    for h in range(1, G + 1):
        for lo in {(G - h) // 2, (G - h + 1) // 2}:  # both centering ties
            hi = G - h - lo
            top, bottom = _bucket_margins(lo, hi, G, mult)
            # still a valid shrink-only re-split
            assert 0 <= top <= lo and 0 <= bottom <= hi
            span = G - top - bottom
            assert span % mult == 0 or span == G
            tuples.add((top, bottom))
            spans.add(span)
    assert len(tuples) <= 2 * len(spans), (len(tuples), len(spans))


def test_mixed_geometry_wave_falls_back_per_chunk(engine):
    """A wave mixing different letterbox geometries must still produce
    per-image embeddings equal to the solo path (chunks that can't share
    a content slice upload the full canvas)."""
    settings = VisionSettings(base_size=64, image_size=64, crop_mode=False)
    shapes = [(70, 140), (120, 30), (64, 64), (50, 100)]
    vins = [
        engine.prepare_vision_input(_img(20 + i, h, w), settings)
        for i, (h, w) in enumerate(shapes)
    ]
    batched = engine._compute_image_embeddings_batched(vins)
    for vin, emb in zip(vins, batched):
        solo = engine.compute_image_embedding(vin)
        np.testing.assert_allclose(
            np.asarray(emb), np.asarray(solo), rtol=2e-5, atol=2e-5
        )
