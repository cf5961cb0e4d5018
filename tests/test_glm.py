"""GLM-OCR family: chat scaffold, 3-axis grouped positions, interleaved
partial M-RoPE, sandwich-norm decoder, end-to-end greedy decode
(contracts: infer-glm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.glm import GlmOcrEngine
from dsocr_tpu.models.glm.config import (
    TOKEN_ASSISTANT,
    TOKEN_GMASK,
    TOKEN_NEWLINE,
    TOKEN_SOP,
    TOKEN_USER,
    tiny_glm_config,
)
from dsocr_tpu.models.glm.decoder import (
    compute_glm_position_ids,
    glm_forward,
    glm_mrope_cos_sin,
    init_glm_text_params,
    new_cache,
)
from dsocr_tpu.models.glm.engine import glm_smart_resize, preprocess_glm_image
from dsocr_tpu.runtime.kv_cache import bump_length, reset

CFG = tiny_glm_config()


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return None


def test_prompt_scaffold():
    engine = GlmOcrEngine(CFG, dtype=jnp.float32, max_seq_len=256)
    tokens, mask = engine.build_prompt_tokens(FakeTokenizer(), "<image>x", [(1, 4, 4)])
    assert tokens[:4] == [TOKEN_GMASK, TOKEN_SOP, TOKEN_USER, TOKEN_NEWLINE]
    assert tokens[-2:] == [TOKEN_ASSISTANT, TOKEN_NEWLINE]
    assert tokens[4] == CFG.image_start_token_id
    # grid (1,4,4) merge 2 → 4 image tokens
    assert tokens[5:9] == [CFG.image_token_id] * 4
    assert tokens[9] == CFG.image_end_token_id
    assert mask[5:9] == [1, 1, 1, 1]


def test_position_ids_grouped():
    img = CFG.image_token_id
    ids = np.asarray([7, 8, img, img, img, img, 9], np.int64)
    pos, next_base = compute_glm_position_ids(
        img, CFG.video_start_token_id, CFG.video_end_token_id, ids, [(1, 4, 4)], 2
    )
    # text group [0, 1]; image group base 2: h/w in 0..1 offset → 2..3
    np.testing.assert_array_equal(pos[:, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[0, 2:6], [2, 2, 2, 2])
    np.testing.assert_array_equal(pos[1, 2:6], [2, 2, 3, 3])
    np.testing.assert_array_equal(pos[2, 2:6], [2, 3, 2, 3])
    # trailing text continues at max+1 = 4
    np.testing.assert_array_equal(pos[:, 6], [4, 4, 4])
    assert next_base == 5


def test_mrope_interleaved_duplication():
    # position 0 → cos 1 everywhere; distinct positions per axis exercise
    # section select + pairwise interleave
    pos = jnp.zeros((3, 1, 2), jnp.int32)
    cos, sin = glm_mrope_cos_sin(pos, CFG.text)
    assert cos.shape == (1, 2, CFG.text.rope_dim)
    np.testing.assert_allclose(np.asarray(cos), 1.0)
    np.testing.assert_allclose(np.asarray(sin), 0.0)
    # pairwise duplication: entries come in equal pairs
    pos2 = jnp.asarray(np.arange(6).reshape(3, 1, 2), jnp.int32)
    cos2 = np.asarray(glm_mrope_cos_sin(pos2, CFG.text)[0])
    np.testing.assert_allclose(cos2[..., 0::2], cos2[..., 1::2])


def test_glm_decoder_cache_consistency():
    t = CFG.text
    params = init_glm_text_params(t, jax.random.PRNGKey(0), jnp.float32)
    S = 4
    tokens = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, 100)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None, None], (3, 1, 1))

    cache_full = reset(new_cache(t, 1, 16, jnp.float32))
    full_logits, _ = glm_forward(params, t, embeds, pos, cache_full, full_logits=True)

    cache = reset(new_cache(t, 1, 16, jnp.float32))
    logits2, cache = glm_forward(params, t, embeds[:, :2], pos[:, :, :2], cache)
    cache = bump_length(cache, 2)
    np.testing.assert_allclose(
        np.asarray(logits2[0]), np.asarray(full_logits[0, 1]), rtol=5e-4, atol=5e-4
    )
    for s in range(2, S):
        logits_s, cache = glm_forward(
            params, t, embeds[:, s : s + 1], pos[:, :, s : s + 1], cache
        )
        cache = bump_length(cache, 1)
        np.testing.assert_allclose(
            np.asarray(logits_s[0]), np.asarray(full_logits[0, s]),
            rtol=5e-4, atol=5e-4,
        )


def test_glm_smart_resize_budgets():
    rh, rw = glm_smart_resize(100, 200, 28, 2, min_pixels=1, max_pixels=10**9)
    assert rh % 28 == 0 and rw % 28 == 0
    rh2, rw2 = glm_smart_resize(1000, 1000, 28, 2, min_pixels=1, max_pixels=2 * 112 * 112)
    assert 2 * rh2 * rw2 <= 2 * 112 * 112 + 28 * 28 * 4  # near budget


def test_preprocess_patch_layout():
    img = np.random.default_rng(0).integers(0, 256, (28, 56, 3), dtype=np.uint8)
    patches, grid = preprocess_glm_image(img, CFG)
    t, gh, gw = grid
    v = CFG.vision
    assert patches.shape == (gh * gw, 3 * v.temporal_patch_size * 14 * 14)
    # temporal duplication: the two frame halves of a patch are identical
    p = patches[0].reshape(3, v.temporal_patch_size, 14, 14)
    np.testing.assert_allclose(p[:, 0], p[:, 1])


def test_engine_greedy_only():
    engine = GlmOcrEngine(CFG, dtype=jnp.float32, max_seq_len=256)
    with pytest.raises(ValueError, match="greedy"):
        engine.decode(
            FakeTokenizer(), "<image>", [np.zeros((28, 28, 3), np.uint8)],
            VisionSettings(336, 336, False),
            DecodeParameters(do_sample=True, temperature=1.0, max_new_tokens=2),
        )


@pytest.fixture(scope="module")
def tiny_engine():
    return GlmOcrEngine(CFG, dtype=jnp.float32, max_seq_len=512)


def test_engine_decode_end_to_end(tiny_engine):
    rng = np.random.default_rng(2)
    image = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    out = tiny_engine.decode(
        FakeTokenizer(),
        "<image>OCR this",
        [image],
        VisionSettings(336, 336, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
    )
    assert out.prompt_tokens > 6
    assert 0 < out.response_tokens <= 4


def test_engine_deterministic(tiny_engine):
    rng = np.random.default_rng(3)
    image = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    settings = VisionSettings(336, 336, False)
    a = tiny_engine.decode(FakeTokenizer(), "<image>", [image], settings, params)
    b = tiny_engine.decode(FakeTokenizer(), "<image>", [image], settings, params)
    assert a.generated_tokens == b.generated_tokens


def test_frame_attention_chunked_matches_unchunked():
    """Query-chunked vision attention (ref vision.rs:740) must equal the
    single-shot computation, including the padded final chunk."""
    import dsocr_tpu.models.glm.vision as gv

    rng = np.random.default_rng(6)
    B, H, S, D = 1, 2, 37, 8
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    ref = np.asarray(gv._frame_attention(q, k, v))
    old_q, old_k = gv._QUERY_CHUNK, gv._KEY_CHUNK
    gv._QUERY_CHUNK = 16  # force the chunked path with a ragged tail
    try:
        out = np.asarray(gv._frame_attention(q, k, v))
        # r4: keys block too (online softmax, GLM serve OOM fix) —
        # a ragged key tail must mask its padding out of every row
        gv._KEY_CHUNK = 16
        out_kb = np.asarray(gv._frame_attention(q, k, v))
    finally:
        gv._QUERY_CHUNK, gv._KEY_CHUNK = old_q, old_k
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_kb, ref, rtol=1e-5, atol=1e-5)


def test_segment_attention_matches_frame_attention():
    """_segment_attention (jitted packed tower) must match per-frame
    _frame_attention on real rows, for both the small single-softmax
    path and the chunked online path, with q/k padding masked."""
    import dsocr_tpu.models.glm.vision as gv

    rng = np.random.default_rng(7)
    NH, D = 2, 8
    lens = [23, 41]
    n = sum(lens)
    q = jnp.asarray(rng.normal(size=(n, NH, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, NH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, NH, D)).astype(np.float32))
    ref_parts = []
    start = 0
    for length in lens:
        ctx = gv._frame_attention(
            q[start : start + length].transpose(1, 0, 2)[None],
            k[start : start + length].transpose(1, 0, 2)[None],
            v[start : start + length].transpose(1, 0, 2)[None],
        )
        ref_parts.append(np.asarray(ctx[0].transpose(1, 0, 2)))
        start += length
    ref = np.concatenate(ref_parts)

    pad = 16
    qp = jnp.concatenate([q, jnp.zeros((pad, NH, D), q.dtype)])
    kp = jnp.concatenate([k, jnp.zeros((pad, NH, D), k.dtype)])
    vp = jnp.concatenate([v, jnp.zeros((pad, NH, D), v.dtype)])
    seg = jnp.asarray(
        np.concatenate(
            [np.full(lens[0], 0), np.full(lens[1], 1), np.full(pad, -1)]
        ).astype(np.int32)
    )
    small = np.asarray(gv._segment_attention(qp, kp, vp, seg))[:n]
    np.testing.assert_allclose(small, ref, rtol=1e-5, atol=1e-5)

    old_q, old_k = gv._QUERY_CHUNK, gv._KEY_CHUNK
    gv._QUERY_CHUNK = gv._KEY_CHUNK = 16  # force the online path
    try:
        chunked = np.asarray(gv._segment_attention(qp, kp, vp, seg))[:n]
    finally:
        gv._QUERY_CHUNK, gv._KEY_CHUNK = old_q, old_k
    np.testing.assert_allclose(chunked, ref, rtol=1e-5, atol=1e-5)


def test_bucket_tokens_bounds_keys():
    from dsocr_tpu.models.glm.vision import bucket_tokens

    buckets = {bucket_tokens(nn, 4) for nn in range(1, 40000, 37)}
    assert len(buckets) <= 4 * 17
    for nn in range(1, 40000, 997):
        b = bucket_tokens(nn, 4)
        assert b >= nn and b % 4 == 0 and (b - nn) <= max(1024, nn // 3)


def test_vision_jit_matches_eager(tiny_engine, monkeypatch):
    """The padded-bucket jitted tower must reproduce the eager path on a
    multi-image pack with unequal grids (segment mask + padding), in
    both upload modes (u8 LUT on device vs normalized f32)."""
    from dsocr_tpu.models.glm.engine import preprocess_glm_image_raw

    rng = np.random.default_rng(11)
    images = [
        rng.integers(0, 256, (40, 60, 3), dtype=np.uint8),
        rng.integers(0, 256, (52, 36, 3), dtype=np.uint8),
    ]
    patches, grids = [], []
    for im in images:
        p, g = preprocess_glm_image_raw(im, tiny_engine.cfg)
        patches.append(p)
        grids.append(g)
    packed = np.concatenate(patches)
    monkeypatch.setenv("DSOCR_GLM_VISION_JIT", "0")
    eager = np.asarray(tiny_engine._vision_forward(packed, grids))
    monkeypatch.setenv("DSOCR_GLM_VISION_JIT", "1")
    monkeypatch.setenv("DSOCR_GLM_U8_UPLOAD", "0")
    jitted_f32 = np.asarray(tiny_engine._vision_forward(packed, grids))
    monkeypatch.setenv("DSOCR_GLM_U8_UPLOAD", "1")
    jitted_u8 = np.asarray(tiny_engine._vision_forward(packed, grids))
    assert eager.shape == jitted_f32.shape == jitted_u8.shape
    np.testing.assert_allclose(jitted_f32, eager, rtol=2e-5, atol=2e-5)
    # the u8 LUT path feeds bit-identical pixels into the same graph
    np.testing.assert_array_equal(jitted_u8, jitted_f32)


def test_glm_norm_table_bit_exact():
    """LUT normalization must equal the reference formula exactly:
    ((x f64 / 255) → f32 − mean) / std, per channel."""
    from dsocr_tpu.models.glm.engine import (
        glm_normalize_host,
        preprocess_glm_image_raw,
    )

    rng = np.random.default_rng(13)
    image = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    cfg = CFG
    v = cfg.vision
    ps, merge, tps = v.patch_size, v.spatial_merge_size, v.temporal_patch_size
    u8, grid = preprocess_glm_image_raw(image, cfg)
    got = glm_normalize_host(u8, cfg)
    # original (pre-r5) computation, inlined as the spec
    from dsocr_tpu.image.resample import resize_bicubic
    from dsocr_tpu.models.glm.engine import glm_smart_resize

    h, w = image.shape[:2]
    rh, rw = glm_smart_resize(
        h, w, ps * merge, tps, cfg.min_pixels, cfg.max_pixels
    )
    img = resize_bicubic(image, rw, rh) if (rh, rw) != (h, w) else image
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    norm = ((img.astype(np.float64) / 255.0).astype(np.float32) - mean) / std
    gh, gw = rh // ps, rw // ps
    x = norm.reshape(gh // merge, merge, ps, gw // merge, merge, ps, 3)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5).reshape(gh * gw, 3, ps, ps)
    x = np.repeat(x[:, :, None], tps, axis=2).reshape(gh * gw, -1)
    np.testing.assert_array_equal(got, x)


def test_engine_decode_tokens_jit_vs_eager(tiny_engine, monkeypatch):
    rng = np.random.default_rng(12)
    image = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    settings = VisionSettings(336, 336, False)
    monkeypatch.setenv("DSOCR_GLM_VISION_JIT", "0")
    eager = tiny_engine.decode(FakeTokenizer(), "<image>go", [image], settings, params)
    monkeypatch.setenv("DSOCR_GLM_VISION_JIT", "1")
    jitted = tiny_engine.decode(FakeTokenizer(), "<image>go", [image], settings, params)
    assert eager.generated_tokens == jitted.generated_tokens
