"""DeepSeek-OCR family: SAM window math, rel-pos bias, placeholder
formulas, MoE decoder cache consistency, fusion assembly, tiny
end-to-end decode (contracts: infer-deepseek)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.models.deepseek.decoder import (
    build_decoder_rope,
    deepseek_forward,
    init_deepseek_params,
    new_cache,
)
from dsocr_tpu.models.deepseek.fusion import (
    append_row_breaks,
    build_clip_sam_tokens,
    build_image_placeholders,
    format_local_tokens,
)
from dsocr_tpu.models.deepseek.sam import (
    get_rel_pos,
    rel_pos_bias,
    window_partition,
    window_unpartition,
)
from dsocr_tpu.runtime.kv_cache import bump_length, reset

CFG = tiny_deepseek_config()


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


# -- SAM pieces ---------------------------------------------------------------


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 10, 4)).astype(np.float32))
    windows, pad_hw = window_partition(x, 4)
    assert pad_hw == (8, 12)
    assert windows.shape == (2 * 2 * 3, 4, 4, 4)
    restored = window_unpartition(windows, 4, pad_hw, (6, 10))
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x))


def test_window_partition_no_pad():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 2)).astype(np.float32))
    windows, pad_hw = window_partition(x, 4)
    assert pad_hw == (8, 8)
    # first window must equal the top-left 4x4 block
    np.testing.assert_allclose(np.asarray(windows[0]), np.asarray(x[0, :4, :4]))


def test_get_rel_pos_exact_table():
    # table length == 2*size-1 → direct relative indexing
    table = jnp.asarray(np.arange(7 * 2, dtype=np.float32).reshape(7, 2))
    out = np.asarray(get_rel_pos(4, 4, table))
    assert out.shape == (4, 4, 2)
    # rel index for (qi, ki) = qi - ki + 3
    np.testing.assert_allclose(out[0, 0], np.asarray(table[3]))
    np.testing.assert_allclose(out[3, 0], np.asarray(table[6]))
    np.testing.assert_allclose(out[0, 3], np.asarray(table[0]))


def test_rel_pos_bias_matches_naive():
    rng = np.random.default_rng(2)
    qh = qw = 3
    d = 4
    q = rng.normal(size=(1, 2, qh * qw, d)).astype(np.float32)
    rel_h = rng.normal(size=(2 * qh - 1, d)).astype(np.float32)
    rel_w = rng.normal(size=(2 * qw - 1, d)).astype(np.float32)
    bias = np.asarray(
        rel_pos_bias(jnp.asarray(q), (qh, qw), jnp.asarray(rel_h), jnp.asarray(rel_w))
    )
    # naive: bias[q, k] = q·rel_h[qh_i - kh + qh-1] + q·rel_w[qw_i - kw + qw-1]
    for head in range(2):
        for qi in range(qh * qw):
            qhi, qwi = divmod(qi, qw)
            for ki in range(qh * qw):
                khi, kwi = divmod(ki, qw)
                expected = q[0, head, qi] @ rel_h[qhi - khi + qh - 1] + (
                    q[0, head, qi] @ rel_w[qwi - kwi + qw - 1]
                )
                np.testing.assert_allclose(
                    bias[0, head, qi, ki], expected, rtol=1e-4, atol=1e-5
                )


# -- placeholder math ------------------------------------------------------------


def test_placeholders_no_crop():
    # image_size 640 → grid 40 → ceil(40/4)=10 → 10 rows of 11 + 1 = 111
    out = build_image_placeholders(5, None, 1024, 640, crop_mode=False)
    assert len(out) == 10 * 11 + 1
    assert all(t == 5 for t in out)


def test_placeholders_crop_with_tiles():
    # base 1024 → global 16x(16+1)+1 = 273; local 640, crop (3,2):
    # rows = 10*2, cols = 10*3 → 20*31 = 620 → total 893
    out = build_image_placeholders(5, (3, 2), 1024, 640, crop_mode=True)
    assert len(out) == 620 + 273


def test_placeholders_crop_single_tile_skips_local():
    out = build_image_placeholders(5, (1, 1), 1024, 640, crop_mode=True)
    assert len(out) == 273


def test_placeholders_ocr2_flat():
    out = build_image_placeholders(5, None, 1024, 640, crop_mode=False, variant="ocr2")
    assert len(out) == 100 + 1


# -- fusion ------------------------------------------------------------------------


def test_build_clip_sam_tokens_shapes():
    clip = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, 6)).astype(np.float32))
    sam = jnp.asarray(np.random.default_rng(4).normal(size=(1, 10, 2, 2)).astype(np.float32))
    fused = build_clip_sam_tokens(clip, sam)
    assert fused.shape == (1, 4, 16)
    # first 6 dims are clip (CLS dropped), rest flattened sam tokens
    np.testing.assert_allclose(np.asarray(fused[0, 0, :6]), np.asarray(clip[0, 1]))
    np.testing.assert_allclose(np.asarray(fused[0, 0, 6:]), np.asarray(sam[0, :, 0, 0]))


def test_append_row_breaks():
    grid = jnp.zeros((2, 3, 4))
    newline = jnp.ones((4,))
    out = np.asarray(append_row_breaks(grid, newline))
    assert out.shape == (8, 4)
    np.testing.assert_allclose(out[3], 1.0)  # newline after first row
    np.testing.assert_allclose(out[7], 1.0)


def test_format_local_tokens_tile_order():
    # 2x1 crops (w=2, h=1), side 2: local grid rows interleave tiles horizontally
    side, hidden = 2, 3
    t0 = np.zeros((side * side, hidden), np.float32)
    t1 = np.ones((side * side, hidden), np.float32)
    projected = jnp.asarray(np.stack([t0, t1]))
    out = np.asarray(format_local_tokens(projected, (2, 1), jnp.full((hidden,), 9.0)))
    # rows: [t0 row0, t1 row0, newline, t0 row1, t1 row1, newline]
    assert out.shape == (2 * (4 + 1), hidden)
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[2], 1.0)
    np.testing.assert_allclose(out[4], 9.0)


# -- decoder ------------------------------------------------------------------------


def test_moe_decoder_prefill_then_decode_consistency():
    lang = CFG.language
    params = init_deepseek_params(lang, jax.random.PRNGKey(0), jnp.float32)
    rope = build_decoder_rope(lang, 64)
    S = 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, lang.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    cache_full = reset(new_cache(lang, 1, 16, jnp.float32))
    full_logits, _ = deepseek_forward(
        params, lang, embeds, pos, cache_full, rope, full_logits=True
    )

    cache = reset(new_cache(lang, 1, 16, jnp.float32))
    logits3, cache = deepseek_forward(
        params, lang, embeds[:, :3], pos[:, :3], cache, rope
    )
    cache = bump_length(cache, 3)
    np.testing.assert_allclose(
        np.asarray(logits3[0]), np.asarray(full_logits[0, 2]), rtol=5e-4, atol=5e-4
    )
    for s in range(3, S):
        logits_s, cache = deepseek_forward(
            params, lang, embeds[:, s : s + 1], pos[:, s : s + 1], cache, rope
        )
        cache = bump_length(cache, 1)
        np.testing.assert_allclose(
            np.asarray(logits_s[0]),
            np.asarray(full_logits[0, s]),
            rtol=5e-4,
            atol=5e-4,
        )


def test_partial_rope_changes_only_rope_dims():
    """qk_rope_head_dim < head_dim: positions must not affect tail dims'
    contribution — verified indirectly: same token at two positions gives
    different logits (rope active) but rope_dim=0 would not."""
    lang = CFG.language
    assert lang.rope_dim < lang.head_dim
    params = init_deepseek_params(lang, jax.random.PRNGKey(3), jnp.float32)
    rope = build_decoder_rope(lang, 64)
    token = jnp.asarray([7])
    embeds = params["embed_tokens"][token][None].astype(jnp.float32)
    out = []
    for p in (0, 5):
        cache = reset(new_cache(lang, 1, 16, jnp.float32))
        cache = bump_length(cache, p)  # pretend p tokens already cached (zeros)
        logits, _ = deepseek_forward(
            params, lang, embeds, jnp.asarray([[p]], jnp.int32), cache, rope
        )
        out.append(np.asarray(logits))
    assert not np.allclose(out[0], out[1])


# -- end-to-end -------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_engine():
    return DeepseekOcrEngine(CFG, dtype=jnp.float32, max_seq_len=1024)


def test_engine_decode_no_crop(tiny_engine):
    rng = np.random.default_rng(8)
    image = rng.integers(0, 256, size=(80, 100, 3), dtype=np.uint8)
    # image_size 64 → grid 4 → ceil(4/4)=1 → 1 row of 2 + 1 = 3 tokens
    outcome = tiny_engine.decode(
        FakeTokenizer(),
        "<image>\nOCR.",
        [image],
        VisionSettings(base_size=64, image_size=64, crop_mode=False),
        DecodeParameters(max_new_tokens=6, no_repeat_ngram_size=None),
    )
    assert outcome.prompt_tokens > 3
    assert 0 < outcome.response_tokens <= 6


def test_engine_decode_crop_mode(tiny_engine):
    rng = np.random.default_rng(9)
    image = rng.integers(0, 256, size=(70, 140, 3), dtype=np.uint8)  # wide → 2x1 tiles
    outcome = tiny_engine.decode(
        FakeTokenizer(),
        "<image>\nOCR.",
        [image],
        VisionSettings(base_size=64, image_size=64, crop_mode=True),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
    )
    assert outcome.response_tokens > 0


def test_engine_deterministic(tiny_engine):
    rng = np.random.default_rng(10)
    image = rng.integers(0, 256, size=(50, 50, 3), dtype=np.uint8)
    settings = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    out1 = tiny_engine.decode(FakeTokenizer(), "<image>a", [image], settings, params)
    out2 = tiny_engine.decode(FakeTokenizer(), "<image>a", [image], settings, params)
    assert out1.generated_tokens == out2.generated_tokens


# -- OCR2 variant --------------------------------------------------------------


def test_ocr2_attention_mask_semantics():
    from dsocr_tpu.models.deepseek.ocr2 import ocr2_attention_mask

    m = np.asarray(ocr2_attention_mask(2))  # [4, 4]
    # image rows (0,1): attend image cols only
    np.testing.assert_array_equal(m[0], [True, True, False, False])
    np.testing.assert_array_equal(m[1], [True, True, False, False])
    # query rows (2,3): all image cols + causal over queries
    np.testing.assert_array_equal(m[2], [True, True, True, False])
    np.testing.assert_array_equal(m[3], [True, True, True, True])


def test_ocr2_encode_view_shapes():
    from dsocr_tpu.models.deepseek.ocr2 import (
        init_ocr2_params,
        ocr2_encode_view,
        tiny_qwen2_encoder_params,
    )

    p = tiny_qwen2_encoder_params()
    params = init_ocr2_params(p, jax.random.PRNGKey(0))
    # SAM features [1, hidden=16, 2, 2] → seq 4 == query_768 bucket
    sam = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 2, 2)).astype(np.float32))
    out = ocr2_encode_view(params, p, sam)
    assert out.shape == (1, 4, p.projector_out)
    # 4x4 grid → seq 16 == query_1024 bucket
    sam2 = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 4, 4)).astype(np.float32))
    assert ocr2_encode_view(params, p, sam2).shape == (1, 16, p.projector_out)
    # unsupported grid errors
    with pytest.raises(ValueError, match="unsupported"):
        ocr2_encode_view(params, p, jnp.zeros((1, 16, 3, 3)))


def test_ocr2_engine_end_to_end():
    import dataclasses as dc

    from dsocr_tpu.models.deepseek.ocr2 import tiny_qwen2_encoder_params

    cfg = dc.replace(tiny_deepseek_config(), variant="ocr2", clip=None)
    p = tiny_qwen2_encoder_params()
    # sam tiny config out_channels (8, 16) → hidden 16 matches p.hidden_size
    engine = DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512, ocr2_params=p
    )
    # image_size 128 → sam grid 128/64 = 2 → seq 4 (query_768 bucket);
    # placeholders: ceil((128/16)/4)=2 → flat 2x2 + 1 = 5 tokens
    image = np.random.default_rng(11).integers(0, 256, (100, 100, 3), dtype=np.uint8)
    out = engine.decode(
        FakeTokenizer(),
        "<image>ocr",
        [image],
        VisionSettings(base_size=128, image_size=128, crop_mode=False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def test_decode_batch_matches_single(tiny_engine):
    """Left-padded batched decode must reproduce per-request greedy
    outputs exactly (the batching math is masking-only)."""
    rng = np.random.default_rng(20)
    img_a = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (90, 50, 3), dtype=np.uint8)
    settings = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=5, no_repeat_ngram_size=None)
    tok = FakeTokenizer()

    single_a = tiny_engine.decode(tok, "<image>short", [img_a], settings, params)
    single_b = tiny_engine.decode(
        tok, "<image>a much longer prompt here", [img_b], settings, params
    )
    batch = tiny_engine.decode_batch(
        tok,
        ["<image>short", "<image>a much longer prompt here"],
        [[img_a], [img_b]],
        settings,
        params,
    )
    assert batch[0].generated_tokens == single_a.generated_tokens
    assert batch[1].generated_tokens == single_b.generated_tokens


def test_decode_batch_buckets_batch_size(tiny_engine):
    """B is padded to {1,2,4,8,...} so mixed batch sizes within a bucket
    share ONE generator compilation (remote compiles take minutes); the
    filler rows never surface in the outputs."""
    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (50, 50, 3), dtype=np.uint8) for _ in range(3)]
    settings = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    tok = FakeTokenizer()
    prompts = [f"<image>req {i}" for i in range(3)]

    before = {k for k in tiny_engine._generator_cache if isinstance(k, tuple)}
    out3 = tiny_engine.decode_batch(tok, prompts, [[i] for i in imgs], settings, params)
    out4 = tiny_engine.decode_batch(
        tok, prompts + ["<image>req 3"], [[i] for i in imgs] + [[imgs[0]]],
        settings, params,
    )
    assert len(out3) == 3 and len(out4) == 4
    # rows shared by both calls decode identically
    assert [o.generated_tokens for o in out3] == [
        o.generated_tokens for o in out4[:3]
    ]
    after = {k for k in tiny_engine._generator_cache if isinstance(k, tuple)}
    new_keys = after - before
    assert len(new_keys) == 1  # B=3 and B=4 shared the B=4 bucket
    assert next(iter(new_keys))[2] == 4


def test_no_cache_matches_cached_decode(tiny_engine):
    """--no-cache recompute path must reproduce the cached greedy decode
    (ref generate_without_cache, model/mod.rs:2050-2288)."""
    rng = np.random.default_rng(30)
    image = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
    settings = VisionSettings(64, 64, False)
    cached = tiny_engine.decode(
        FakeTokenizer(), "<image>q", [image], settings,
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
    )
    uncached = tiny_engine.decode(
        FakeTokenizer(), "<image>q", [image], settings,
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None, use_cache=False),
    )
    assert uncached.generated_tokens == cached.generated_tokens

def test_debug_logits_dump(tiny_engine, tmp_path, monkeypatch):
    """cli-debug hook (ref model/mod.rs:1952-1960): dumping top-2 logits
    at a chosen step writes a JSON file with margin + chosen token."""
    import json

    out = tmp_path / "logits.json"
    monkeypatch.setenv("DSOCR_DEBUG_LOGITS_STEP", "1")
    monkeypatch.setenv("DSOCR_DEBUG_LOGITS_PATH", str(out))
    rng = np.random.default_rng(31)
    image = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
    tiny_engine.decode(
        FakeTokenizer(), "<image>q", [image], VisionSettings(64, 64, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None, use_cache=False),
    )
    payload = json.loads(out.read_text())
    assert payload["step"] == 1
    assert payload["top1_id"] == payload["chosen"]
    assert payload["margin"] >= 0.0

def test_quantized_decode_runs_and_tracks_float():
    """Q8 runtime quantization (ref quantized variants serve from packed
    ggml weights via QMatMul): the quantized engine must decode through
    the same path and stay close to the float engine — greedy tokens may
    legitimately differ at near-ties, so compare decode shape only."""
    import dataclasses

    # Q8_0 blocks need every contraction dim % 32
    qcfg = dataclasses.replace(
        CFG,
        language=dataclasses.replace(
            CFG.language, moe_intermediate_size=32, intermediate_size=64
        ),
    )
    eng_f = DeepseekOcrEngine(qcfg, dtype=jnp.float32, max_seq_len=512)
    eng_q = DeepseekOcrEngine(
        qcfg, params=jax.tree_util.tree_map(lambda x: x, eng_f.params),
        dtype=jnp.float32, max_seq_len=512, quantize="q8_0",
    )
    rng = np.random.default_rng(40)
    image = rng.integers(0, 256, size=(60, 60, 3), dtype=np.uint8)
    settings = VisionSettings(64, 64, False)
    params = DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None)
    out_f = eng_f.decode(FakeTokenizer(), "<image>q", [image], settings, params)
    out_q = eng_q.decode(FakeTokenizer(), "<image>q", [image], settings, params)
    assert len(out_q.generated_tokens) == len(out_f.generated_tokens)

def test_vision_debug_trace(tiny_engine, tmp_path, monkeypatch):
    """cli-debug vision trace parity: per-stage stats dumped when
    DSOCR_DEBUG_VISION_PATH is set."""
    import json

    out = tmp_path / "vision.json"
    monkeypatch.setenv("DSOCR_DEBUG_VISION_PATH", str(out))
    rng = np.random.default_rng(41)
    image = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
    tiny_engine.decode(
        FakeTokenizer(), "<image>q", [image], VisionSettings(64, 64, False),
        DecodeParameters(max_new_tokens=2, no_repeat_ngram_size=None),
    )
    payload = json.loads(out.read_text())
    names = [s["stage"] for s in payload["stages"]]
    assert names == ["sam", "clip", "fusion", "projector"]
    assert all("mean" in s and "shape" in s for s in payload["stages"])

def test_quantized_prefill_decode_consistency():
    """Prefill (per-layer dequant + grouped matmul) and decode (q8 gather
    kernel) read the same packed weights — cached decode logits must match
    teacher-forced full-sequence logits."""
    import dataclasses
    from dsocr_tpu.models.deepseek.quantize import quantize_decoder_params

    lang = dataclasses.replace(
        CFG.language, moe_intermediate_size=32, intermediate_size=64
    )
    params = init_deepseek_params(lang, jax.random.PRNGKey(3), jnp.float32)
    params = quantize_decoder_params(
        jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    )
    rope = build_decoder_rope(lang, 64)
    S = 40  # > 32 so prefill takes the dequant path
    tokens = jax.random.randint(jax.random.PRNGKey(4), (S,), 0, lang.vocab_size)
    embeds = jnp.asarray(params["embed_tokens"])[tokens][None].astype(jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    cache_full = reset(new_cache(lang, 1, 64, jnp.float32))
    full_logits, _ = deepseek_forward(
        params, lang, embeds, pos, cache_full, rope, full_logits=True
    )
    cache = reset(new_cache(lang, 1, 64, jnp.float32))
    logits_p, cache = deepseek_forward(
        params, lang, embeds[:, :S - 2], pos[:, :S - 2], cache, rope
    )
    cache = bump_length(cache, S - 2)
    np.testing.assert_allclose(
        np.asarray(logits_p[0]), np.asarray(full_logits[0, S - 3]),
        rtol=2e-2, atol=2e-2,
    )
    for s in range(S - 2, S):
        logits_s, cache = deepseek_forward(
            params, lang, embeds[:, s : s + 1], pos[:, s : s + 1], cache, rope
        )
        cache = bump_length(cache, 1)
        np.testing.assert_allclose(
            np.asarray(logits_s[0]), np.asarray(full_logits[0, s]),
            rtol=2e-2, atol=2e-2,
        )

def test_fused_params_match_unfused():
    """fuse_decoder_params concatenates column-independent projections —
    logits must match the unfused forward."""
    from dsocr_tpu.models.deepseek.decoder import fuse_decoder_params

    lang = CFG.language
    params = init_deepseek_params(lang, jax.random.PRNGKey(7), jnp.float32)
    rope = build_decoder_rope(lang, 64)
    S = 6
    tokens = jax.random.randint(jax.random.PRNGKey(8), (S,), 0, lang.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    cache = reset(new_cache(lang, 1, 16, jnp.float32))
    ref_logits, _ = deepseek_forward(
        params, lang, embeds, pos, cache, rope, full_logits=True
    )
    fused = fuse_decoder_params(params)
    assert "qkv_proj" in fused["moe_layers"] and "experts_gateup" in fused["moe_layers"]
    cache = reset(new_cache(lang, 1, 16, jnp.float32))
    fused_logits, _ = deepseek_forward(
        fused, lang, embeds, pos, cache, rope, full_logits=True
    )
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )


def test_ocr2_batched_embeddings_match_single():
    """OCR2 pooled towers (one encoder call per view shape across the
    wave) must reproduce the per-image embeddings, crop and flat mixed."""
    import dataclasses as dc

    from dsocr_tpu.models.deepseek.ocr2 import tiny_qwen2_encoder_params

    cfg = dc.replace(tiny_deepseek_config(), variant="ocr2", clip=None)
    engine = DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512,
        ocr2_params=tiny_qwen2_encoder_params(),
    )
    rng = np.random.default_rng(13)
    settings = VisionSettings(base_size=128, image_size=128, crop_mode=False)
    vins = [
        engine.prepare_vision_input(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), settings
        )
        for h, w in ((100, 100), (90, 120), (128, 70))
    ]
    # crop-mode image: its tiles pool into the same per-shape batch
    vins.append(
        engine.prepare_vision_input(
            rng.integers(0, 256, (300, 500, 3), dtype=np.uint8),
            VisionSettings(base_size=128, image_size=128, crop_mode=True),
        )
    )
    assert vins[-1].patches is not None  # really exercises pooled locals
    singles = [engine.compute_image_embedding(v) for v in vins]
    batched = engine._compute_image_embeddings_batched(vins)
    assert len(batched) == len(singles)
    for got, want in zip(batched, singles):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_ocr2_slot_serving_matches_solo():
    """OCR2 engine through the continuous scheduler (pooled prefill
    wave) reproduces solo decode tokens."""
    import asyncio
    import dataclasses as dc

    from dsocr_tpu.models.deepseek.ocr2 import tiny_qwen2_encoder_params
    from dsocr_tpu.server.scheduler import ContinuousScheduler

    cfg = dc.replace(tiny_deepseek_config(), variant="ocr2", clip=None)
    engine = DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512,
        ocr2_params=tiny_qwen2_encoder_params(),
    )
    rng = np.random.default_rng(14)
    imgs = [rng.integers(0, 256, (100, 100, 3), dtype=np.uint8) for _ in range(2)]
    settings = VisionSettings(base_size=128, image_size=128, crop_mode=False)
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    tok = FakeTokenizer()
    solos = [
        engine.decode(tok, f"<image>o{i}", [im], settings, params)
        for i, im in enumerate(imgs)
    ]

    async def go():
        sched = ContinuousScheduler(engine, tok, n_slots=2, max_len=256,
                                    chunk_steps=2)
        return await asyncio.gather(*(
            sched.submit(f"<image>o{i}", [im], settings, params)
            for i, im in enumerate(imgs)
        ))

    for got, solo in zip(asyncio.run(go()), solos):
        assert got.generated_tokens == solo.generated_tokens


def test_ocr2_batched_embeddings_chunked_cap():
    """The OCR2 pooled path chunks big shape groups at the micro-batch
    cap (with pow2 padding) and still reproduces per-image results."""
    import dataclasses as dc

    from dsocr_tpu.models.deepseek.ocr2 import tiny_qwen2_encoder_params

    cfg = dc.replace(tiny_deepseek_config(), variant="ocr2", clip=None)
    engine = DeepseekOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=512,
        ocr2_params=tiny_qwen2_encoder_params(),
    )
    engine.vision_batch_tiles = 2  # force chunking: 5 views -> 3 chunks
    rng = np.random.default_rng(33)
    settings = VisionSettings(base_size=128, image_size=128, crop_mode=False)
    vins = [
        engine.prepare_vision_input(
            rng.integers(0, 256, (80 + 7 * i, 100, 3), dtype=np.uint8), settings
        )
        for i in range(5)
    ]
    singles = [engine.compute_image_embedding(v) for v in vins]
    batched = engine._compute_image_embeddings_batched(vins)
    for got, want in zip(batched, singles):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
