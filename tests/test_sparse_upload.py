"""Sparse document coding for pixel uploads (image/sparse_code.py).

Serving is link-bound (r4 attribution: pixel upload = 85% of the tower
wall); background-dominated pages ship as bitmask + exception values and
are decoded by a small device jit. These tests pin:
  * encode→decode is BIT-EXACT (integer-only path),
  * non-document (noise) chunks fall back to raw upload,
  * the K bucket is a power of two (bounds decode compile keys),
  * the engine's batched embeddings are IDENTICAL with sparse upload on
    and off (exact equality — unlike the content-slice 2e-5 tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import VisionSettings
from dsocr_tpu.image.sparse_code import decode_views, encode_views
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config


def _doc_chunk(seed, b, h, w, density=0.15):
    """Document-like views: constant background + sparse 'ink' pixels."""
    rng = np.random.default_rng(seed)
    chunk = np.empty((b, 3, h, w), np.uint8)
    for i in range(b):
        bg = rng.integers(0, 256, size=3, dtype=np.uint8)
        view = np.broadcast_to(bg[:, None, None], (3, h, w)).copy()
        ink = rng.random((h, w)) < density
        view[:, ink] = rng.integers(0, 256, size=(3, int(ink.sum())), dtype=np.uint8)
        chunk[i] = view
    return chunk


def _roundtrip(chunk):
    sp = encode_views(chunk)
    assert sp is not None
    out = decode_views(
        jnp.asarray(sp.mask_bits), jnp.asarray(sp.values), jnp.asarray(sp.bg),
        shape=sp.shape,
    )
    np.testing.assert_array_equal(np.asarray(out), chunk)
    return sp


def test_roundtrip_bit_exact():
    sp = _roundtrip(_doc_chunk(0, 4, 64, 64))
    raw = 4 * 3 * 64 * 64
    assert sp.nbytes < raw  # actually compresses


def test_roundtrip_odd_sizes_and_bgs():
    # N not a multiple of 8 exercises the unpack slice; per-view bgs differ
    _roundtrip(_doc_chunk(1, 3, 5, 7, density=0.3))


def test_roundtrip_all_background():
    chunk = np.full((2, 3, 16, 16), 23, np.uint8)
    sp = _roundtrip(chunk)
    assert sp.n_values == 0


def test_noise_falls_back_to_raw():
    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, size=(2, 3, 32, 32), dtype=np.uint8)
    assert encode_views(noise) is None


def test_k_bucket_bounds_compile_keys_and_waste():
    from dsocr_tpu.image.sparse_code import bucket_k

    # every K in a wide range maps to a bounded bucket set with <=~28%
    # padding waste (quarter-octave buckets)
    buckets = {bucket_k(k) for k in range(1, 1 << 21, 997)}
    assert len(buckets) <= 4 * 22
    for k in range(1025, 1 << 21, 9973):
        b = bucket_k(k)
        assert b >= k and (b - k) <= max(1024, k // 3)
    for seed in range(8):
        sp = encode_views(_doc_chunk(seed, 2, 64, 64, density=0.05 * (seed + 1)))
        if sp is None:
            continue
        assert sp.values.shape[0] == bucket_k(sp.n_values)


@pytest.fixture(scope="module")
def engine():
    return DeepseekOcrEngine(
        tiny_deepseek_config(), dtype=jnp.float32, max_seq_len=1024
    )


def _doc_image(seed, h, w):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 235, np.uint8)
    ink = rng.random((h, w)) < 0.12
    img[ink] = rng.integers(0, 128, size=(int(ink.sum()), 3), dtype=np.uint8)
    return img


def test_batched_embeddings_sparse_vs_raw(engine, monkeypatch):
    settings = VisionSettings(base_size=64, image_size=64, crop_mode=True)
    vins = [
        engine.prepare_vision_input(_doc_image(s, 70, 140), settings)
        for s in range(3, 7)
    ]
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "0")
    raw = engine._compute_image_embeddings_batched(vins)
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "1")
    sparse = engine._compute_image_embeddings_batched(vins)
    for a, b in zip(raw, sparse):
        # decoded pixels are bit-exact → identical tower outputs
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serving_tokens_sparse_vs_raw(engine, monkeypatch):
    """End-to-end: prefill packets (logits + ids) identical under sparse
    upload, so slot serving produces identical tokens."""

    class Tok:
        def encode(self, text):
            return [ord(c) % 100 for c in text]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

        def token_to_id(self, token):
            return 127 if token == "<image>" else None

    settings = VisionSettings(base_size=64, image_size=64, crop_mode=True)
    requests = [
        ("<image>\nOCR.", [_doc_image(10 + i, 70, 140)], settings)
        for i in range(4)
    ]
    tok = Tok()
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "0")
    raw = engine.prefill_for_slots(tok, requests)
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "1")
    sparse = engine.prefill_for_slots(tok, requests)
    for a, b in zip(raw, sparse):
        np.testing.assert_array_equal(
            np.asarray(a["prompt_ids"]), np.asarray(b["prompt_ids"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["logits"]), np.asarray(b["logits"])
        )


def test_solo_embedding_sparse_vs_raw(engine, monkeypatch):
    """compute_image_embedding (single-request path) must be identical
    under sparse upload — its tiles AND global view ship coded."""
    settings = VisionSettings(base_size=64, image_size=64, crop_mode=True)
    vin = engine.prepare_vision_input(_doc_image(30, 70, 140), settings)
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "0")
    raw = np.asarray(engine.compute_image_embedding(vin))
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "1")
    sparse = np.asarray(engine.compute_image_embedding(vin))
    np.testing.assert_array_equal(raw, sparse)


def test_ocr2_pooled_embeddings_sparse_vs_raw(monkeypatch):
    """The OCR2 pooled-tower path also ships sparse-coded views —
    embeddings must be identical either way."""
    import dataclasses as dc

    from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
    from dsocr_tpu.models.deepseek.ocr2 import tiny_qwen2_encoder_params

    cfg = dc.replace(tiny_deepseek_config(), variant="ocr2", clip=None)
    engine2 = DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512,
        ocr2_params=tiny_qwen2_encoder_params(),
    )
    settings = VisionSettings(base_size=128, image_size=128, crop_mode=True)
    vins = [
        engine2.prepare_vision_input(_doc_image(40 + s, 300, 500), settings)
        for s in range(3)
    ]
    assert vins[0].patches is not None  # pooled locals really exercised
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "0")
    raw = engine2._ocr2_embeddings_batched(vins)
    monkeypatch.setenv("DSOCR_SPARSE_UPLOAD", "1")
    sparse = engine2._ocr2_embeddings_batched(vins)
    for a, b in zip(raw, sparse):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
