"""Checkpoint loader round-trips: write a tiny HF-named safetensors file,
load through the family loaders, and run an end-to-end decode with the
loaded weights (validates the full name map mechanically)."""

import numpy as np
import jax.numpy as jnp
import pytest
from safetensors.numpy import save_file

from dsocr_tpu.core import DecodeParameters, VisionSettings
from dsocr_tpu.models.deepseek import DeepseekOcrEngine
from dsocr_tpu.models.deepseek.config import tiny_deepseek_config
from dsocr_tpu.models.deepseek.loader import load_deepseek_params
from dsocr_tpu.models.paddleocr import PaddleOcrEngine
from dsocr_tpu.models.paddleocr.config import tiny_paddle_config
from dsocr_tpu.models.paddleocr.loader import load_paddle_params


def _rand(rng, *shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def _make_deepseek_checkpoint(path):
    cfg = tiny_deepseek_config()
    rng = np.random.default_rng(0)
    t = {}
    # SAM (embed 8, depth 2, base grid 4, window 2, heads 2, head_dim 4)
    sam = "model.sam_model"
    t[f"{sam}.patch_embed.proj.weight"] = _rand(rng, 8, 3, 16, 16)
    t[f"{sam}.patch_embed.proj.bias"] = _rand(rng, 8)
    t[f"{sam}.pos_embed"] = _rand(rng, 1, 4, 4, 8)
    for i, rel in enumerate([3, 7]):  # block 0 windowed (win 2), block 1 global
        b = f"{sam}.blocks.{i}"
        t[f"{b}.norm1.weight"] = np.ones(8, np.float32)
        t[f"{b}.norm1.bias"] = np.zeros(8, np.float32)
        t[f"{b}.norm2.weight"] = np.ones(8, np.float32)
        t[f"{b}.norm2.bias"] = np.zeros(8, np.float32)
        t[f"{b}.attn.qkv.weight"] = _rand(rng, 24, 8)
        t[f"{b}.attn.qkv.bias"] = _rand(rng, 24)
        t[f"{b}.attn.proj.weight"] = _rand(rng, 8, 8)
        t[f"{b}.attn.proj.bias"] = _rand(rng, 8)
        t[f"{b}.attn.rel_pos_h"] = _rand(rng, rel, 4)
        t[f"{b}.attn.rel_pos_w"] = _rand(rng, rel, 4)
        t[f"{b}.mlp.fc1.weight"] = _rand(rng, 32, 8)
        t[f"{b}.mlp.fc1.bias"] = _rand(rng, 32)
        t[f"{b}.mlp.fc2.weight"] = _rand(rng, 8, 32)
        t[f"{b}.mlp.fc2.bias"] = _rand(rng, 8)
    t[f"{sam}.neck.0.weight"] = _rand(rng, 8, 8, 1, 1)
    t[f"{sam}.neck.1.weight"] = np.ones(8, np.float32)
    t[f"{sam}.neck.1.bias"] = np.zeros(8, np.float32)
    t[f"{sam}.neck.2.weight"] = _rand(rng, 8, 8, 3, 3)
    t[f"{sam}.neck.3.weight"] = np.ones(8, np.float32)
    t[f"{sam}.neck.3.bias"] = np.zeros(8, np.float32)
    t[f"{sam}.net_2.weight"] = _rand(rng, 8, 8, 3, 3)
    t[f"{sam}.net_3.weight"] = _rand(rng, 16, 8, 3, 3)
    # CLIP (hidden 16, 2 layers, seq (28/14)^2=4)
    clip = "model.vision_model"
    t[f"{clip}.embeddings.class_embedding"] = _rand(rng, 16)
    t[f"{clip}.embeddings.position_embedding.weight"] = _rand(rng, 5, 16)
    t[f"{clip}.pre_layrnorm.weight"] = np.ones(16, np.float32)
    t[f"{clip}.pre_layrnorm.bias"] = np.zeros(16, np.float32)
    for i in range(2):
        b = f"{clip}.transformer.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            t[f"{b}.{ln}.weight"] = np.ones(16, np.float32)
            t[f"{b}.{ln}.bias"] = np.zeros(16, np.float32)
        t[f"{b}.self_attn.qkv_proj.weight"] = _rand(rng, 48, 16)
        t[f"{b}.self_attn.qkv_proj.bias"] = _rand(rng, 48)
        t[f"{b}.self_attn.out_proj.weight"] = _rand(rng, 16, 16)
        t[f"{b}.self_attn.out_proj.bias"] = _rand(rng, 16)
        t[f"{b}.mlp.fc1.weight"] = _rand(rng, 64, 16)
        t[f"{b}.mlp.fc1.bias"] = _rand(rng, 64)
        t[f"{b}.mlp.fc2.weight"] = _rand(rng, 16, 64)
        t[f"{b}.mlp.fc2.bias"] = _rand(rng, 16)
    # projector (input 32 = clip 16 + sam 16, n_embed 32)
    t["model.projector.layers.weight"] = _rand(rng, 32, 32)
    t["model.projector.layers.bias"] = _rand(rng, 32)
    t["model.image_newline"] = _rand(rng, 32)
    t["model.view_seperator"] = _rand(rng, 32)
    # decoder: layer 0 dense, layers 1-2 MoE (4 experts, moe_inter 16, shared 1)
    t["model.embed_tokens.weight"] = _rand(rng, 128, 32)
    t["model.norm.weight"] = np.ones(32, np.float32)
    t["lm_head.weight"] = _rand(rng, 128, 32)
    for i in range(3):
        b = f"model.layers.{i}"
        t[f"{b}.input_layernorm.weight"] = np.ones(32, np.float32)
        t[f"{b}.post_attention_layernorm.weight"] = np.ones(32, np.float32)
        t[f"{b}.self_attn.q_proj.weight"] = _rand(rng, 32, 32)
        t[f"{b}.self_attn.k_proj.weight"] = _rand(rng, 32, 32)
        t[f"{b}.self_attn.v_proj.weight"] = _rand(rng, 32, 32)
        t[f"{b}.self_attn.o_proj.weight"] = _rand(rng, 32, 32)
        if i == 0:
            t[f"{b}.mlp.gate_proj.weight"] = _rand(rng, 64, 32)
            t[f"{b}.mlp.up_proj.weight"] = _rand(rng, 64, 32)
            t[f"{b}.mlp.down_proj.weight"] = _rand(rng, 32, 64)
        else:
            t[f"{b}.mlp.gate.weight"] = _rand(rng, 4, 32)
            for e in range(4):
                t[f"{b}.mlp.experts.{e}.gate_proj.weight"] = _rand(rng, 16, 32)
                t[f"{b}.mlp.experts.{e}.up_proj.weight"] = _rand(rng, 16, 32)
                t[f"{b}.mlp.experts.{e}.down_proj.weight"] = _rand(rng, 32, 16)
            t[f"{b}.mlp.shared_experts.gate_proj.weight"] = _rand(rng, 16, 32)
            t[f"{b}.mlp.shared_experts.up_proj.weight"] = _rand(rng, 16, 32)
            t[f"{b}.mlp.shared_experts.down_proj.weight"] = _rand(rng, 32, 16)
    save_file(t, str(path))
    return cfg, t


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 100 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def token_to_id(self, token):
        return 127 if token == "<image>" else None


def test_deepseek_loader_roundtrip(tmp_path):
    path = tmp_path / "model.safetensors"
    cfg, tensors = _make_deepseek_checkpoint(path)
    params = load_deepseek_params(path, cfg, dtype=jnp.float32)

    # spot checks: transposition and stacking
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["lm_head"]), tensors["lm_head.weight"].T
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["moe_layers"]["experts_gate"][0, 2]),
        tensors["model.layers.1.mlp.experts.2.gate_proj.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["sam"]["blocks"][1]["rel_pos_h"]),
        tensors["model.sam_model.blocks.1.attn.rel_pos_h"],
    )

    engine = DeepseekOcrEngine(cfg, params=params, dtype=jnp.float32, max_seq_len=512)
    image = np.random.default_rng(1).integers(0, 256, (80, 80, 3), dtype=np.uint8)
    out = engine.decode(
        FakeTokenizer(),
        "<image>\nx",
        [image],
        VisionSettings(64, 64, False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0


def _make_paddle_checkpoint(path):
    cfg = tiny_paddle_config()
    v = cfg.vision_config
    rng = np.random.default_rng(2)
    t = {}
    root = "visual.vision_model"
    t[f"{root}.embeddings.patch_embedding.weight"] = _rand(rng, v.hidden_size, 3, 14, 14)
    t[f"{root}.embeddings.patch_embedding.bias"] = _rand(rng, v.hidden_size)
    t[f"{root}.embeddings.position_embedding.weight"] = _rand(
        rng, v.base_grid * v.base_grid, v.hidden_size
    )
    t[f"{root}.post_layernorm.weight"] = np.ones(v.hidden_size, np.float32)
    t[f"{root}.post_layernorm.bias"] = np.zeros(v.hidden_size, np.float32)
    for i in range(v.num_hidden_layers):
        b = f"{root}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            t[f"{b}.{ln}.weight"] = np.ones(v.hidden_size, np.float32)
            t[f"{b}.{ln}.bias"] = np.zeros(v.hidden_size, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{b}.self_attn.{proj}.weight"] = _rand(rng, v.hidden_size, v.hidden_size)
            t[f"{b}.self_attn.{proj}.bias"] = _rand(rng, v.hidden_size)
        t[f"{b}.mlp.fc1.weight"] = _rand(rng, v.intermediate_size, v.hidden_size)
        t[f"{b}.mlp.fc1.bias"] = _rand(rng, v.intermediate_size)
        t[f"{b}.mlp.fc2.weight"] = _rand(rng, v.hidden_size, v.intermediate_size)
        t[f"{b}.mlp.fc2.bias"] = _rand(rng, v.hidden_size)
    merged = v.hidden_size * v.spatial_merge_size**2
    t["mlp_AR.pre_norm.weight"] = np.ones(v.hidden_size, np.float32)
    t["mlp_AR.pre_norm.bias"] = np.zeros(v.hidden_size, np.float32)
    t["mlp_AR.linear_1.weight"] = _rand(rng, merged, merged)
    t["mlp_AR.linear_1.bias"] = _rand(rng, merged)
    t["mlp_AR.linear_2.weight"] = _rand(rng, cfg.hidden_size, merged)
    t["mlp_AR.linear_2.bias"] = _rand(rng, cfg.hidden_size)
    t["model.embed_tokens.weight"] = _rand(rng, cfg.vocab_size, cfg.hidden_size)
    t["model.norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    D, NH, NKV = cfg.head_dim, cfg.num_attention_heads, cfg.resolved_num_key_value_heads
    for i in range(cfg.num_hidden_layers):
        b = f"model.layers.{i}"
        t[f"{b}.input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        t[f"{b}.post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        t[f"{b}.self_attn.q_proj.weight"] = _rand(rng, NH * D, cfg.hidden_size)
        t[f"{b}.self_attn.k_proj.weight"] = _rand(rng, NKV * D, cfg.hidden_size)
        t[f"{b}.self_attn.v_proj.weight"] = _rand(rng, NKV * D, cfg.hidden_size)
        t[f"{b}.self_attn.o_proj.weight"] = _rand(rng, cfg.hidden_size, NH * D)
        t[f"{b}.mlp.gate_proj.weight"] = _rand(rng, cfg.intermediate_size, cfg.hidden_size)
        t[f"{b}.mlp.up_proj.weight"] = _rand(rng, cfg.intermediate_size, cfg.hidden_size)
        t[f"{b}.mlp.down_proj.weight"] = _rand(rng, cfg.hidden_size, cfg.intermediate_size)
    save_file(t, str(path))
    return cfg, t


def test_paddle_loader_roundtrip(tmp_path):
    path = tmp_path / "model.safetensors"
    cfg, tensors = _make_paddle_checkpoint(path)
    params = load_paddle_params(path, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["layers"]["q_proj"][1]),
        tensors["model.layers.1.self_attn.q_proj.weight"].T,
    )
    # tied embeddings: no lm_head key
    assert "lm_head" not in params["decoder"]

    engine = PaddleOcrEngine(cfg, params=params, dtype=jnp.float32, max_seq_len=512)
    engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
    image = np.random.default_rng(3).integers(0, 256, (28, 28, 3), dtype=np.uint8)
    out = engine.decode(
        FakeTokenizer(),
        "<image>\nx",
        [image],
        VisionSettings(28, 28, False),
        DecodeParameters(max_new_tokens=3, no_repeat_ngram_size=None),
    )
    assert out.response_tokens > 0
