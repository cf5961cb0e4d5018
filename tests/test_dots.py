"""DotsOCR family: sequence layout, 2D rotary, packed vision, Qwen2
cache consistency, end-to-end decode (contracts: infer-dots)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.dots import DotsOcrEngine
from dsocr_tpu.models.dots.config import tiny_dots_config
from dsocr_tpu.models.dots.decoder import (
    build_qwen2_rope,
    init_qwen2_params,
    new_cache,
    qwen2_forward,
)
from dsocr_tpu.models.dots.vision import SequenceLayout, build_2d_rope
from dsocr_tpu.runtime.kv_cache import bump_length, reset

CFG = tiny_dots_config()


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 200 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return None


def test_sequence_layout_single_image():
    layout = SequenceLayout.from_grid([(1, 4, 6)], merge=2)
    assert layout.total_tokens == 24
    assert layout.merge_groups == 6
    assert layout.frames == ((0, 24),)
    assert layout.uniform_frame_len == 24
    # merge-window order: first four positions are the top-left 2x2 window
    np.testing.assert_array_equal(
        layout.positions[:4], [[0, 0], [0, 1], [1, 0], [1, 1]]
    )


def test_sequence_layout_multi_image_packing():
    layout = SequenceLayout.from_grid([(1, 2, 2), (1, 2, 4)], merge=2)
    assert layout.total_tokens == 4 + 8
    assert layout.frames == ((0, 4), (4, 8))
    assert layout.uniform_frame_len is None  # ragged


def test_2d_rope_position_zero_identity():
    cos, sin = build_2d_rope(np.zeros((3, 2), np.int32), head_dim=8)
    np.testing.assert_allclose(np.asarray(cos), 1.0)
    np.testing.assert_allclose(np.asarray(sin), 0.0)


def test_qwen2_prefill_decode_consistency():
    t = CFG.text
    params = init_qwen2_params(t, jax.random.PRNGKey(0), jnp.float32)
    rope = build_qwen2_rope(t, 64)
    S = 5
    tokens = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, t.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    cache_full = reset(new_cache(t, 1, 16, jnp.float32))
    full_logits, _ = qwen2_forward(
        params, t, embeds, pos, cache_full, rope, full_logits=True
    )
    cache = reset(new_cache(t, 1, 16, jnp.float32))
    logits2, cache = qwen2_forward(params, t, embeds[:, :2], pos[:, :2], cache, rope)
    cache = bump_length(cache, 2)
    np.testing.assert_allclose(
        np.asarray(logits2[0]), np.asarray(full_logits[0, 1]), rtol=5e-4, atol=5e-4
    )
    for s in range(2, S):
        logits_s, cache = qwen2_forward(
            params, t, embeds[:, s : s + 1], pos[:, s : s + 1], cache, rope
        )
        cache = bump_length(cache, 1)
        np.testing.assert_allclose(
            np.asarray(logits_s[0]), np.asarray(full_logits[0, s]),
            rtol=5e-4, atol=5e-4,
        )


def test_qwen2_bias_changes_output():
    t = CFG.text
    params = init_qwen2_params(t, jax.random.PRNGKey(2), jnp.float32)
    assert "q_bias" in params["layers"]  # attention_bias default true
    rope = build_qwen2_rope(t, 16)
    embeds = params["embed_tokens"][jnp.asarray([3])][None].astype(jnp.float32)
    pos = jnp.asarray([[0]], jnp.int32)
    cache = reset(new_cache(t, 1, 8, jnp.float32))
    base, _ = qwen2_forward(params, t, embeds, pos, cache, rope)
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    # v_bias feeds the value path directly (q_bias is invisible at S=1:
    # softmax over a single key is 1 regardless of the query)
    params2["layers"]["v_bias"] = params["layers"]["v_bias"] + 0.5
    mod, _ = qwen2_forward(params2, t, embeds, pos, cache, rope)
    assert not np.allclose(np.asarray(base), np.asarray(mod))


@pytest.fixture(scope="module")
def tiny_engine():
    engine = DotsOcrEngine(CFG, dtype=jnp.float32, max_seq_len=512)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
    return engine


def test_engine_decode_end_to_end(tiny_engine):
    rng = np.random.default_rng(3)
    image = rng.integers(0, 256, (28, 56, 3), dtype=np.uint8)
    out = tiny_engine.decode(
        FakeTokenizer(),
        "<image>\nExtract text.",
        [image],
        VisionSettings(28, 56, False),
        DecodeParameters(max_new_tokens=5, no_repeat_ngram_size=None),
    )
    assert out.prompt_tokens > 2
    assert 0 < out.response_tokens <= 5


def test_engine_multi_image(tiny_engine):
    rng = np.random.default_rng(4)
    imgs = [
        rng.integers(0, 256, (28, 28, 3), dtype=np.uint8),
        rng.integers(0, 256, (28, 56, 3), dtype=np.uint8),
    ]
    out = tiny_engine.decode(
        FakeTokenizer(),
        "<image>and<image>",
        imgs,
        VisionSettings(28, 56, False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def make_dots_checkpoint(path, cfg=None):
    """HF-named synthetic dots checkpoint (shared with test_weights_day)."""
    from safetensors.numpy import save_file

    cfg = cfg or CFG
    rng = np.random.default_rng(5)
    v, t = cfg.vision, cfg.text

    def r(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    tensors = {}
    root = "vision_tower"
    tensors[f"{root}.patch_embed.patchifier.proj.weight"] = r(v.embed_dim, 3, 14, 14)
    tensors[f"{root}.patch_embed.patchifier.proj.bias"] = r(v.embed_dim)
    tensors[f"{root}.patch_embed.patchifier.norm.weight"] = np.ones(v.embed_dim, np.float32)
    tensors[f"{root}.post_trunk_norm.weight"] = np.ones(v.embed_dim, np.float32)
    merged = v.embed_dim * 4
    tensors[f"{root}.merger.ln_q.weight"] = np.ones(v.embed_dim, np.float32)
    tensors[f"{root}.merger.ln_q.bias"] = np.zeros(v.embed_dim, np.float32)
    tensors[f"{root}.merger.mlp.0.weight"] = r(merged, merged)
    tensors[f"{root}.merger.mlp.0.bias"] = r(merged)
    tensors[f"{root}.merger.mlp.2.weight"] = r(v.hidden_size, merged)
    tensors[f"{root}.merger.mlp.2.bias"] = r(v.hidden_size)
    for i in range(v.num_hidden_layers):
        blk = f"{root}.blocks.{i}"
        tensors[f"{blk}.norm1.weight"] = np.ones(v.embed_dim, np.float32)
        tensors[f"{blk}.norm2.weight"] = np.ones(v.embed_dim, np.float32)
        tensors[f"{blk}.attn.qkv.weight"] = r(3 * v.embed_dim, v.embed_dim)
        tensors[f"{blk}.attn.proj.weight"] = r(v.embed_dim, v.embed_dim)
        tensors[f"{blk}.mlp.fc1.weight"] = r(v.intermediate_size, v.embed_dim)
        tensors[f"{blk}.mlp.fc2.weight"] = r(v.embed_dim, v.intermediate_size)
        tensors[f"{blk}.mlp.fc3.weight"] = r(v.intermediate_size, v.embed_dim)
    tensors["model.embed_tokens.weight"] = r(t.vocab_size, t.hidden_size)
    tensors["model.norm.weight"] = np.ones(t.hidden_size, np.float32)
    tensors["lm_head.weight"] = r(t.vocab_size, t.hidden_size)
    D, NH, NKV = t.head_dim, t.num_attention_heads, t.num_key_value_heads
    for i in range(t.num_hidden_layers):
        b = f"model.layers.{i}"
        tensors[f"{b}.input_layernorm.weight"] = np.ones(t.hidden_size, np.float32)
        tensors[f"{b}.post_attention_layernorm.weight"] = np.ones(t.hidden_size, np.float32)
        tensors[f"{b}.self_attn.q_proj.weight"] = r(NH * D, t.hidden_size)
        tensors[f"{b}.self_attn.q_proj.bias"] = r(NH * D)
        tensors[f"{b}.self_attn.k_proj.weight"] = r(NKV * D, t.hidden_size)
        tensors[f"{b}.self_attn.k_proj.bias"] = r(NKV * D)
        tensors[f"{b}.self_attn.v_proj.weight"] = r(NKV * D, t.hidden_size)
        tensors[f"{b}.self_attn.v_proj.bias"] = r(NKV * D)
        tensors[f"{b}.self_attn.o_proj.weight"] = r(t.hidden_size, NH * D)
        tensors[f"{b}.mlp.gate_proj.weight"] = r(t.intermediate_size, t.hidden_size)
        tensors[f"{b}.mlp.up_proj.weight"] = r(t.intermediate_size, t.hidden_size)
        tensors[f"{b}.mlp.down_proj.weight"] = r(t.hidden_size, t.intermediate_size)
    save_file(tensors, str(path))
    return tensors


def test_fused_and_quantized_forward_track_float():
    """Engine-init fusion (qkv/gateup concat) is bit-identical math and
    Q8 packed projections (ops/linear.project) must track the float
    forward within quantization error (ref QMatMul path for the dots
    adapter, dsq-models/src/adapters)."""
    import dataclasses

    from dsocr_tpu.models.dots.decoder import fuse_qwen2_params
    from dsocr_tpu.models.dots.quantize import quantize_qwen2_params

    # hidden 64 so every linear is Q8-block-eligible (contraction % 32)
    t = dataclasses.replace(CFG.text, hidden_size=64, intermediate_size=96)
    params = init_qwen2_params(t, jax.random.PRNGKey(6), jnp.float32)
    rope = build_qwen2_rope(t, 16)
    S = 4
    tokens = jax.random.randint(jax.random.PRNGKey(7), (S,), 0, t.vocab_size)
    embeds = params["embed_tokens"][tokens][None].astype(jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    cache = reset(new_cache(t, 1, 16, jnp.float32))
    base, _ = qwen2_forward(params, t, embeds, pos, cache, rope, full_logits=True)

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    fused = fuse_qwen2_params(host)
    fused_d = jax.tree_util.tree_map(jnp.asarray, fused)
    assert "qkv_proj" in fused_d["layers"] and "qkv_bias" in fused_d["layers"]
    out_f, _ = qwen2_forward(fused_d, t, embeds, pos, cache, rope, full_logits=True)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(base), rtol=5e-4, atol=5e-4
    )

    qp = quantize_qwen2_params(fused, "q8_0")
    qp = jax.tree_util.tree_map(jnp.asarray, qp)
    assert isinstance(qp["layers"]["qkv_proj"], dict)
    assert isinstance(qp["lm_head"], dict)
    out_q, _ = qwen2_forward(qp, t, embeds, pos, cache, rope, full_logits=True)
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(base), rtol=5e-2, atol=5e-2
    )


def test_quantized_engine_decodes():
    """DSOCR_QUANT/registry `quantize=` wiring: a Q8 dots engine decodes
    end-to-end through the packed projections."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        vision=dataclasses.replace(CFG.vision, hidden_size=64),
        text=dataclasses.replace(CFG.text, hidden_size=64, intermediate_size=96),
    )
    engine = DotsOcrEngine(
        cfg, dtype=jnp.float32, max_seq_len=256, quantize="q8_0"
    )
    assert isinstance(engine.params["decoder"]["layers"]["qkv_proj"], dict)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 28}
    out = engine.decode(
        FakeTokenizer(),
        "<image>",
        [np.zeros((28, 28, 3), np.uint8)],
        VisionSettings(28, 28, False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def test_dots_loader_roundtrip(tmp_path):
    from dsocr_tpu.models.dots.loader import load_dots_params

    path = tmp_path / "model.safetensors"
    tensors = make_dots_checkpoint(path)

    params = load_dots_params(path, CFG, dtype=jnp.float32)
    assert "q_bias" in params["decoder"]["layers"]
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["layers"]["q_bias"][1]),
        tensors["model.layers.1.self_attn.q_proj.bias"],
    )
    engine = DotsOcrEngine(CFG, params=params, dtype=jnp.float32, max_seq_len=256)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 28}
    out = engine.decode(
        FakeTokenizer(),
        "<image>",
        [np.zeros((28, 28, 3), np.uint8)],
        VisionSettings(28, 28, False),
        DecodeParameters(max_new_tokens=2, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def test_vision_jit_matches_eager(tiny_engine, monkeypatch):
    """The padded-bucket jitted tower (segment-mask packed attention)
    must reproduce the eager per-frame path on a multi-image pack with
    unequal grids, in both upload modes (u8 LUT on device vs f32)."""
    from dsocr_tpu.image import SmartResizeConfig
    from dsocr_tpu.image.smart_resize import preprocess_patches_raw
    from dsocr_tpu.models.dots.vision import SequenceLayout

    rng = np.random.default_rng(21)
    images = [
        rng.integers(0, 256, (28, 56, 3), dtype=np.uint8),
        rng.integers(0, 256, (56, 28, 3), dtype=np.uint8),
    ]
    prep = SmartResizeConfig(
        patch_size=tiny_engine.cfg.vision.patch_size,
        merge_size=tiny_engine.cfg.vision.spatial_merge_size,
        **tiny_engine.prep_overrides,
    )
    patches, grids = [], []
    for im in images:
        p = preprocess_patches_raw(im, prep)
        patches.append(p.patches)
        grids.append(p.grid_thw)
    layout = SequenceLayout.from_grid(
        grids, tiny_engine.cfg.vision.spatial_merge_size
    )
    packed = np.concatenate(patches)
    assert packed.dtype == np.uint8
    monkeypatch.setenv("DSOCR_DOTS_VISION_JIT", "0")
    eager = np.asarray(tiny_engine._vision_forward(packed, layout, prep))
    monkeypatch.setenv("DSOCR_DOTS_VISION_JIT", "1")
    monkeypatch.setenv("DSOCR_DOTS_U8_UPLOAD", "0")
    jitted_f32 = np.asarray(tiny_engine._vision_forward(packed, layout, prep))
    monkeypatch.setenv("DSOCR_DOTS_U8_UPLOAD", "1")
    jitted_u8 = np.asarray(tiny_engine._vision_forward(packed, layout, prep))
    assert eager.shape == jitted_f32.shape == jitted_u8.shape
    np.testing.assert_allclose(jitted_f32, eager, rtol=2e-5, atol=2e-5)
    # the u8 LUT path feeds bit-identical pixels into the same graph
    np.testing.assert_array_equal(jitted_u8, jitted_f32)


def test_norm_table_bit_exact_vs_reference_formula():
    """image.norm_table LUT must equal the pre-r5 whole-image formula
    ((x f32 * rescale) - mean) / std exactly, and preprocess_patches
    (which now routes through the LUT) must match it."""
    from dsocr_tpu.image import SmartResizeConfig, preprocess_patches
    from dsocr_tpu.image.smart_resize import norm_table

    cfg = SmartResizeConfig(
        patch_size=2, merge_size=2, min_pixels=1, max_pixels=16 * 32,
        image_mean=(0.48145466, 0.4578275, 0.40821073),
        image_std=(0.26862954, 0.26130258, 0.27577711),
    )
    rng = np.random.default_rng(31)
    image = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    ref = (image.astype(np.float32) * cfg.rescale_factor - mean) / std
    table = norm_table(cfg)
    lut = table[np.arange(3)[None, None, :], image.astype(np.int64)]
    np.testing.assert_array_equal(lut, ref)
    got = preprocess_patches(image, cfg)
    # reconstruct the patch stack from ref the old way
    gh, gw, p = 16 // 2, 32 // 2, 2
    old = ref.reshape(gh, p, gw, p, 3).transpose(0, 2, 4, 1, 3).reshape(
        gh * gw, 3, p, p
    )
    np.testing.assert_array_equal(got.patches, old)


def test_engine_decode_tokens_jit_vs_eager(tiny_engine, monkeypatch):
    rng = np.random.default_rng(22)
    image = rng.integers(0, 256, (28, 56, 3), dtype=np.uint8)
    params = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    settings = VisionSettings(28, 56, False)
    monkeypatch.setenv("DSOCR_DOTS_VISION_JIT", "0")
    eager = tiny_engine.decode(FakeTokenizer(), "<image>x", [image], settings, params)
    monkeypatch.setenv("DSOCR_DOTS_VISION_JIT", "1")
    jitted = tiny_engine.decode(FakeTokenizer(), "<image>x", [image], settings, params)
    assert eager.generated_tokens == jitted.generated_tokens
