"""PaddleOCR-VL model family: M-RoPE, position ids, decoder cache
consistency, projector merge, end-to-end tiny decode
(contracts: infer-paddleocr/src/{model.rs,transformer/,vision/})."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.paddleocr import PaddleOcrEngine
from dsocr_tpu.models.paddleocr.config import tiny_paddle_config
from dsocr_tpu.models.paddleocr.decoder import (
    compute_position_ids,
    ernie_forward,
    init_ernie_params,
    mrope_cos_sin,
    new_cache,
)
from dsocr_tpu.models.paddleocr.projector import merge_reshape
from dsocr_tpu.models.paddleocr.vision import build_2d_rope, interpolate_pos_grid
from dsocr_tpu.runtime.kv_cache import bump_length, reset


CFG = tiny_paddle_config()


class FakeTokenizer:
    """Maps each character to ord(c) % 200; decode inverts."""

    def encode(self, text):
        return [ord(c) % 200 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return None


# -- M-RoPE ---------------------------------------------------------------------


def test_mrope_sections_select_axes():
    # distinct positions per axis; verify section slices come from the
    # right axis (t from axis0, h from axis1, w from axis2)
    pos = jnp.asarray(
        np.stack(
            [
                np.full((1, 4), 1, np.int32),
                np.full((1, 4), 2, np.int32),
                np.full((1, 4), 3, np.int32),
            ]
        )
    )
    cos, sin = mrope_cos_sin(pos, CFG)
    D = CFG.head_dim  # 16, sections doubled = (8, 4, 4)
    half = D // 2
    inv = 1.0 / (CFG.rope_theta ** (np.arange(half) / half))
    angles = {ax: (ax + 1) * inv for ax in range(3)}
    full = {ax: np.concatenate([angles[ax], angles[ax]]) for ax in range(3)}
    expected = np.concatenate(
        [np.cos(full[0][:8]), np.cos(full[1][8:12]), np.cos(full[2][12:16])]
    )
    np.testing.assert_allclose(np.asarray(cos)[0, 0], expected, rtol=1e-5)


def test_position_ids_text_only():
    ids = np.arange(6, dtype=np.int64)
    pos, delta = compute_position_ids(CFG, ids, [])
    np.testing.assert_array_equal(pos, np.tile(np.arange(6, dtype=np.int32), (3, 1)))
    assert delta == 0


def test_position_ids_with_image():
    # grid (1, 4, 4), merge 2 → 4 placeholder tokens; prompt: [T, I, I, I, I, T]
    img = CFG.image_token_id
    ids = np.asarray([7, img, img, img, img, 9], dtype=np.int64)
    pos, delta = compute_position_ids(CFG, ids, [(1, 4, 4)])
    # text token 0 → (0,0,0); image block base 1: t=1, h=1+row, w=1+col
    np.testing.assert_array_equal(pos[:, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[0, 1:5], [1, 1, 1, 1])
    np.testing.assert_array_equal(pos[1, 1:5], [1, 1, 2, 2])
    np.testing.assert_array_equal(pos[2, 1:5], [1, 2, 1, 2])
    # trailing text resumes at base + block = 5
    np.testing.assert_array_equal(pos[:, 5], [5, 5, 5])
    # max position 5 over 6 tokens → delta 0
    assert delta == 0


def test_position_ids_wide_image_delta():
    # wide grid: w positions exceed sequence length → positive delta
    img = CFG.image_token_id
    ids = np.asarray([img] * 8, dtype=np.int64)  # grid (1, 2, 16) merge 2 → 8 tokens
    pos, delta = compute_position_ids(CFG, ids, [(1, 2, 16)])
    assert pos[2].max() == 7  # w axis: base 0 + col 0..7
    assert delta == pos.max() + 1 - 8


# -- decoder cache consistency -----------------------------------------------------


def test_prefill_then_decode_matches_full_forward():
    """Teacher forcing: running S tokens via prefill+steps must produce the
    same logits as one full forward (the invariant behind cache decode)."""
    key = jax.random.PRNGKey(0)
    params = init_ernie_params(CFG, key, jnp.float32)
    S = 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, CFG.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None, None], (3, 1, 1))

    # full forward, no cache interaction beyond writing
    cache_full = reset(new_cache(CFG, 1, 16, jnp.float32))
    full_logits, _ = ernie_forward(
        params, CFG, embeds, pos, cache_full, full_logits=True
    )

    # prefill first 3, then decode steps 3 and 4
    cache = reset(new_cache(CFG, 1, 16, jnp.float32))
    logits3, cache = ernie_forward(params, CFG, embeds[:, :3], pos[:, :, :3], cache)
    cache = bump_length(cache, 3)
    np.testing.assert_allclose(
        np.asarray(logits3[0]), np.asarray(full_logits[0, 2]), rtol=2e-4, atol=2e-4
    )
    for s in range(3, S):
        logits_s, cache = ernie_forward(
            params, CFG, embeds[:, s : s + 1], pos[:, :, s : s + 1], cache
        )
        cache = bump_length(cache, 1)
        np.testing.assert_allclose(
            np.asarray(logits_s[0]),
            np.asarray(full_logits[0, s]),
            rtol=2e-4,
            atol=2e-4,
        )


def test_fused_and_quantized_forward_track_float():
    """Engine-init fusion (qkv/gateup concat) is bit-identical math and
    Q8 packed projections (ops/linear.project) must track the float
    forward within quantization error (ref QMatMul path for the
    paddleocr-vl adapter, dsq-models/src/adapters)."""
    from dsocr_tpu.models.paddleocr.decoder import fuse_ernie_params
    from dsocr_tpu.models.paddleocr.quantize import quantize_ernie_params

    params = init_ernie_params(CFG, jax.random.PRNGKey(9), jnp.float32)
    S = 4
    tokens = jax.random.randint(jax.random.PRNGKey(10), (S,), 0, CFG.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None, None], (3, 1, 1))

    cache = reset(new_cache(CFG, 1, 16, jnp.float32))
    base, _ = ernie_forward(params, CFG, embeds, pos, cache, full_logits=True)

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    fused = fuse_ernie_params(host)
    fused_d = jax.tree_util.tree_map(jnp.asarray, fused)
    assert "qkv_proj" in fused_d["layers"] and "gateup_proj" in fused_d["layers"]
    out_f, _ = ernie_forward(fused_d, CFG, embeds, pos, cache, full_logits=True)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(base), rtol=5e-4, atol=5e-4
    )

    qp = quantize_ernie_params(fused, "q8_0")
    qp = jax.tree_util.tree_map(jnp.asarray, qp)
    assert isinstance(qp["layers"]["qkv_proj"], dict)
    out_q, _ = ernie_forward(qp, CFG, embeds, pos, cache, full_logits=True)
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(base), rtol=5e-2, atol=5e-2
    )


def test_last_index_selects_true_position():
    """Padded prefill must return logits of the true last token."""
    params = init_ernie_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    S, true_len = 8, 5
    tokens = np.zeros(S, np.int32)
    tokens[:true_len] = np.arange(1, true_len + 1)
    embeds = params["embed_tokens"][jnp.asarray(tokens)][None].astype(jnp.float32)
    pos = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None, None], (3, 1, 1))
    cache = reset(new_cache(CFG, 1, 16, jnp.float32))
    padded_logits, _ = ernie_forward(
        params, CFG, embeds, pos, cache,
        last_index=jnp.asarray([true_len - 1], jnp.int32),
    )
    cache2 = reset(new_cache(CFG, 1, 16, jnp.float32))
    exact_logits, _ = ernie_forward(
        params, CFG, embeds[:, :true_len], pos[:, :, :true_len], cache2
    )
    np.testing.assert_allclose(
        np.asarray(padded_logits), np.asarray(exact_logits), rtol=2e-4, atol=2e-4
    )


# -- vision pieces ---------------------------------------------------------------


def test_interpolate_pos_grid_identity():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 8)).astype(np.float32)  # base_grid 2
    out = interpolate_pos_grid(jnp.asarray(base), 2, 2, 2)
    np.testing.assert_allclose(np.asarray(out), base, rtol=1e-6)


def test_interpolate_pos_grid_upsample_shape():
    base = jnp.asarray(np.random.default_rng(4).normal(size=(4, 8)).astype(np.float32))
    out = interpolate_pos_grid(base, 2, 3, 5)
    assert out.shape == (15, 8)


def test_build_2d_rope_shape_and_position0():
    cos, sin = build_2d_rope(
        jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32), head_dim=8
    )
    assert cos.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(cos), 1.0)
    np.testing.assert_allclose(np.asarray(sin), 0.0)


def test_merge_reshape_ordering():
    # grid (1, 2, 2) merge 2 → 1 merged token containing patches in
    # row-major merge-window order
    feats = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)
    out = merge_reshape(feats, (1, 2, 2), 2)
    assert out.shape == (1, 12)
    # order: (0,0), (0,1), (1,0), (1,1) → rows 0,1,2,3
    np.testing.assert_allclose(np.asarray(out)[0], np.arange(12, dtype=np.float32))


# -- end-to-end tiny decode -------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_engine():
    engine = PaddleOcrEngine(CFG, dtype=jnp.float32, max_seq_len=512)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
    return engine


def test_engine_decode_end_to_end(tiny_engine):
    rng = np.random.default_rng(5)
    image = rng.integers(0, 256, size=(28, 56, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=8, no_repeat_ngram_size=None)
    outcome = tiny_engine.decode(
        FakeTokenizer(),
        "<image>\nOCR:",
        [image],
        VisionSettings(base_size=28, image_size=56, crop_mode=False),
        params,
    )
    assert outcome.prompt_tokens > 0
    assert 0 < outcome.response_tokens <= 8
    assert len(outcome.generated_tokens) == outcome.response_tokens


def test_quantized_engine_decodes():
    """DSOCR_QUANT/registry `quantize=` wiring: a Q8 paddle engine
    decodes end-to-end through the packed projections."""
    engine = PaddleOcrEngine(
        CFG, dtype=jnp.float32, max_seq_len=256, quantize="q8_0"
    )
    assert isinstance(engine.params["decoder"]["layers"]["qkv_proj"], dict)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 28}
    out = engine.decode(
        FakeTokenizer(),
        "<image>\nOCR:",
        [np.zeros((28, 28, 3), np.uint8)],
        VisionSettings(base_size=28, image_size=28, crop_mode=False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def test_engine_decode_deterministic(tiny_engine):
    rng = np.random.default_rng(6)
    image = rng.integers(0, 256, size=(28, 28, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=5, no_repeat_ngram_size=None)
    settings = VisionSettings(base_size=28, image_size=28, crop_mode=False)
    out1 = tiny_engine.decode(FakeTokenizer(), "<image>\nx", [image], settings, params)
    out2 = tiny_engine.decode(FakeTokenizer(), "<image>\nx", [image], settings, params)
    assert out1.generated_tokens == out2.generated_tokens


def test_engine_placeholder_mismatch_raises(tiny_engine):
    params = DecodeParameters(max_new_tokens=2)
    with pytest.raises(ValueError, match="prompt/image mismatch"):
        tiny_engine.decode(
            FakeTokenizer(),
            "no image here",
            [np.zeros((28, 28, 3), np.uint8)],
            VisionSettings(28, 28, False),
            params,
        )


def test_engine_streaming(tiny_engine):
    rng = np.random.default_rng(7)
    image = rng.integers(0, 256, size=(28, 28, 3), dtype=np.uint8)
    seen = []
    tiny_engine.decode(
        FakeTokenizer(),
        "<image>\ny",
        [image],
        VisionSettings(28, 28, False),
        DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None),
        stream=lambda n, toks: seen.append(list(toks)),
    )
    assert seen, "stream callback must fire"
    for a, b in zip(seen, seen[1:]):
        assert b[: len(a)] == a


def test_encode_image_u8_upload_matches_f32(tiny_engine, monkeypatch):
    """Raw-u8 patch upload + on-device LUT normalization must equal the
    normalized-f32 upload exactly (same values into the same graph)."""
    rng = np.random.default_rng(41)
    image = rng.integers(0, 256, size=(28, 56, 3), dtype=np.uint8)
    settings = VisionSettings(base_size=28, image_size=56, crop_mode=False)
    monkeypatch.setenv("DSOCR_PADDLE_U8_UPLOAD", "0")
    f32 = tiny_engine.encode_image(image, settings)
    monkeypatch.setenv("DSOCR_PADDLE_U8_UPLOAD", "1")
    u8 = tiny_engine.encode_image(image, settings)
    np.testing.assert_array_equal(
        np.asarray(f32.embeddings), np.asarray(u8.embeddings)
    )
    assert f32.original_grid == u8.original_grid
