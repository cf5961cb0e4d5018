"""Weights-day rehearsal: the full day-1 pipeline per model family,
offline, on synthetic checkpoints.

Chain per family: write an HF-named safetensors checkpoint → family
loader → engine decode → capture a baseline artifact → re-load the same
checkpoint through a SECOND loader call → decode as the candidate →
strict token gate (bench/gate.py, mirroring
/root/reference/benchsuite/orchestrator.py:456-521 semantics). For
DeepSeek the chain additionally runs the quantized leg: DSQ export via
the dsq CLI (adapter discovery) → loader with snapshot → PACKED Q8
serving from the published codes.

These tests exist so the day real weights arrive is boring: every file
format, name map, CLI flag, and gate comparison has already run.
(VERDICT r2 §missing-5.)
"""

import json
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.bench.capture import TeacherResult, capture_and_gate
from dsocr_tpu.core import DecodeParameters, VisionSettings
from PIL import Image

from tests.test_loaders import (
    FakeTokenizer,
    _make_deepseek_checkpoint,
    _make_paddle_checkpoint,
    _rand,
)


class EngineTeacher:
    """Teacher protocol over a local engine (stand-in for the HF
    transformers teacher, which needs real weights + network)."""

    model_id = "synthetic"

    def __init__(self, engine, tokenizer, vision, params):
        self.engine = engine
        self.tokenizer = tokenizer
        self.vision = vision
        self.params = params

    def run(self, image_path, prompt, max_new_tokens):
        img = np.asarray(Image.open(image_path).convert("RGB"))
        out = self.engine.decode(
            self.tokenizer, prompt, [img], self.vision, self.params
        )
        return TeacherResult(
            rendered_prompt=prompt,
            prompt_tokens=list(range(out.prompt_tokens)),
            generated_tokens=out.generated_tokens,
            text=out.text,
        )


def _img_file(tmp_path, seed=0, size=(60, 60)) -> pathlib.Path:
    img = np.random.default_rng(seed).integers(
        0, 256, (*size, 3), dtype=np.uint8
    )
    path = tmp_path / "page.png"
    Image.fromarray(img).save(path)
    return path


def _rehearse(tmp_path, build_engine, vision, decode_params, prompt="<image>x"):
    """teacher = engine from loader pass 1; candidate = engine from
    loader pass 2; strict gate must pass (loader determinism + the whole
    capture → candidate → gate file chain)."""
    image_path = _img_file(tmp_path)
    tok = FakeTokenizer()
    teacher = EngineTeacher(build_engine(), tok, vision, decode_params)

    def candidate_decode(baseline: dict) -> dict:
        engine = build_engine()  # fresh loader pass, like the real CLI
        img = np.asarray(Image.open(baseline["image"]).convert("RGB"))
        out = engine.decode(tok, baseline["prompt"], [img], vision, decode_params)
        return {
            "rendered_prompt": baseline["prompt"],
            "generated_tokens": out.generated_tokens,
            "text": out.text,
        }

    result = capture_and_gate(
        teacher, image_path, prompt,
        decode_params.max_new_tokens, tmp_path / "baseline",
        decode_fn=candidate_decode, stop_ids=(),
    )
    assert result.passed, result.detail
    # the artifacts a real run would leave behind
    baseline = json.loads((tmp_path / "baseline" / "baseline.json").read_text())
    assert baseline["generated_tokens"], "teacher generated nothing"
    assert (tmp_path / "baseline" / "candidate.json").exists()


def test_deepseek_weights_day(tmp_path):
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.loader import load_deepseek_params

    ckpt = tmp_path / "model.safetensors"
    cfg, _ = _make_deepseek_checkpoint(ckpt)

    def build():
        params = load_deepseek_params(ckpt, cfg, dtype=jnp.float32)
        return DeepseekOcrEngine(cfg, params=params, dtype=jnp.float32,
                                 max_seq_len=512)

    _rehearse(
        tmp_path, build,
        VisionSettings(64, 64, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
    )


def test_deepseek_weights_day_quantized(tmp_path):
    """The quantized leg: checkpoint → dsq CLI export (adapter
    discovery) → loader with snapshot → packed Q8 serving from the
    published codes. Packed serving must decode the same NUMBER of
    tokens as float serving of the dequantized snapshot (greedy tokens
    may flip at near-ties; requantize bit-exactness is covered by
    test_raw_quant)."""
    from dsocr_tpu.dsq.cli import main as dsq_main
    from dsocr_tpu.dsq.format import DsqReader
    from dsocr_tpu.models.deepseek import DeepseekOcrEngine
    from dsocr_tpu.models.deepseek.loader import load_deepseek_params

    ckpt = tmp_path / "model.safetensors"
    cfg, _ = _make_deepseek_checkpoint(ckpt)
    # adapter-discoverable config.json matching the checkpoint dims
    config_json = {
        "architectures": ["DeepseekOCRForCausalLM"],
        "vocab_size": 128,
        "hidden_size": 32,
        "intermediate_size": 64,
        "moe_intermediate_size": 16,
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "n_routed_experts": 4,
        "n_shared_experts": 1,
        "num_experts_per_tok": 2,
        "first_k_dense_replace": 1,
        "max_position_embeddings": 512,
        "projector_config": {"input_dim": 32, "n_embed": 32,
                             "projector_type": "linear"},
        "vision_config": {"width": {"sam_vit_b": {},
                                    "clip-l-14-224": {"width": 16}}},
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config_json))
    snap = tmp_path / "snapshot.dsq"
    rc = dsq_main([
        "export",
        "--weights", str(ckpt),
        "--config", str(config_path),
        "--dtype", "q8_0",
        "--output", str(snap),
    ])
    assert rc == 0
    reader = DsqReader(snap)
    assert reader.header.tensor_count > 0
    reader.close()

    params_f = load_deepseek_params(ckpt, cfg, dtype=jnp.float32,
                                    snapshot_path=snap)
    raw = params_f["decoder"].get("__raw_quant__")
    assert raw, "snapshot raw codes not collected"
    params_q = load_deepseek_params(ckpt, cfg, dtype=jnp.float32,
                                    snapshot_path=snap)

    eng_f = DeepseekOcrEngine(cfg, params=params_f, dtype=jnp.float32,
                              max_seq_len=512)
    eng_q = DeepseekOcrEngine(cfg, params=params_q, dtype=jnp.float32,
                              max_seq_len=512, quantize="q8_0")
    # packed path really engaged
    dense = eng_q.params["decoder"]["dense_layers"]
    assert any(
        isinstance(v, dict) and "codes" in v for v in dense.values()
    ), "no packed q8 linears in the quantized engine"

    tok = FakeTokenizer()
    img = np.random.default_rng(7).integers(0, 256, (60, 60, 3), dtype=np.uint8)
    vision = VisionSettings(64, 64, False)
    dparams = DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None)
    out_f = eng_f.decode(tok, "<image>q", [img], vision, dparams)
    out_q = eng_q.decode(tok, "<image>q", [img], vision, dparams)
    assert len(out_q.generated_tokens) == len(out_f.generated_tokens)


def test_paddle_weights_day(tmp_path):
    from dsocr_tpu.models.paddleocr import PaddleOcrEngine
    from dsocr_tpu.models.paddleocr.loader import load_paddle_params

    ckpt = tmp_path / "model.safetensors"
    cfg, _ = _make_paddle_checkpoint(ckpt)

    def build():
        params = load_paddle_params(ckpt, cfg, dtype=jnp.float32)
        engine = PaddleOcrEngine(cfg, params=params, dtype=jnp.float32,
                                 max_seq_len=512)
        engine.prep_overrides = {"min_pixels": 1, "max_pixels": 28 * 56}
        return engine

    _rehearse(
        tmp_path, build,
        VisionSettings(28, 28, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
        prompt="<image>\nOCR:",
    )


def _make_glm_checkpoint(path):
    from dsocr_tpu.models.glm.config import tiny_glm_config

    cfg = tiny_glm_config()
    v, t = cfg.vision, cfg.text
    rng = np.random.default_rng(11)
    ts = {}
    root = "model.visual"
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2
    ts[f"{root}.patch_embed.proj.weight"] = _rand(rng, v.hidden_size, patch_dim)
    ts[f"{root}.patch_embed.proj.bias"] = _rand(rng, v.hidden_size)
    ts[f"{root}.post_layernorm.weight"] = np.ones(v.hidden_size, np.float32)
    ts[f"{root}.downsample.weight"] = _rand(
        rng, v.out_hidden_size, v.hidden_size,
        v.spatial_merge_size, v.spatial_merge_size,
    )
    OH = v.out_hidden_size
    ts[f"{root}.merger.proj.weight"] = _rand(rng, OH, OH)
    ts[f"{root}.merger.post_projection_norm.weight"] = np.ones(OH, np.float32)
    ts[f"{root}.merger.post_projection_norm.bias"] = np.zeros(OH, np.float32)
    ts[f"{root}.merger.gate_proj.weight"] = _rand(rng, OH * 3, OH)
    ts[f"{root}.merger.up_proj.weight"] = _rand(rng, OH * 3, OH)
    ts[f"{root}.merger.down_proj.weight"] = _rand(rng, OH, OH * 3)
    for i in range(v.depth):
        blk = f"{root}.blocks.{i}"
        ts[f"{blk}.norm1.weight"] = np.ones(v.hidden_size, np.float32)
        ts[f"{blk}.norm2.weight"] = np.ones(v.hidden_size, np.float32)
        ts[f"{blk}.attn.qkv.weight"] = _rand(rng, 3 * v.hidden_size, v.hidden_size)
        ts[f"{blk}.attn.proj.weight"] = _rand(rng, v.hidden_size, v.hidden_size)
        ts[f"{blk}.attn.q_norm.weight"] = np.ones(v.head_dim, np.float32)
        ts[f"{blk}.attn.k_norm.weight"] = np.ones(v.head_dim, np.float32)
        ts[f"{blk}.mlp.gate_proj.weight"] = _rand(rng, v.intermediate_size, v.hidden_size)
        ts[f"{blk}.mlp.up_proj.weight"] = _rand(rng, v.intermediate_size, v.hidden_size)
        ts[f"{blk}.mlp.down_proj.weight"] = _rand(rng, v.hidden_size, v.intermediate_size)
    troot = "model.language_model"
    ts[f"{troot}.embed_tokens.weight"] = _rand(rng, t.vocab_size, t.hidden_size)
    ts[f"{troot}.norm.weight"] = np.ones(t.hidden_size, np.float32)
    D, NH, NKV = t.head_dim, t.num_attention_heads, t.num_key_value_heads
    for i in range(t.num_hidden_layers):
        b = f"{troot}.layers.{i}"
        for norm in ("input_layernorm", "post_attention_layernorm",
                     "post_self_attn_layernorm", "post_mlp_layernorm"):
            ts[f"{b}.{norm}.weight"] = np.ones(t.hidden_size, np.float32)
        ts[f"{b}.self_attn.q_proj.weight"] = _rand(rng, NH * D, t.hidden_size)
        ts[f"{b}.self_attn.q_proj.bias"] = _rand(rng, NH * D)
        ts[f"{b}.self_attn.k_proj.weight"] = _rand(rng, NKV * D, t.hidden_size)
        ts[f"{b}.self_attn.k_proj.bias"] = _rand(rng, NKV * D)
        ts[f"{b}.self_attn.v_proj.weight"] = _rand(rng, NKV * D, t.hidden_size)
        ts[f"{b}.self_attn.v_proj.bias"] = _rand(rng, NKV * D)
        ts[f"{b}.self_attn.o_proj.weight"] = _rand(rng, t.hidden_size, NH * D)
        ts[f"{b}.mlp.gate_up_proj.weight"] = _rand(
            rng, 2 * t.intermediate_size, t.hidden_size
        )
        ts[f"{b}.mlp.down_proj.weight"] = _rand(
            rng, t.hidden_size, t.intermediate_size
        )
    from safetensors.numpy import save_file

    save_file(ts, str(path))
    return cfg, ts


def test_glm_weights_day(tmp_path):
    from dsocr_tpu.models.glm import GlmOcrEngine
    from dsocr_tpu.models.glm.loader import load_glm_params

    ckpt = tmp_path / "model.safetensors"
    cfg, tensors = _make_glm_checkpoint(ckpt)

    def build():
        params = load_glm_params(ckpt, cfg, dtype=jnp.float32)
        return GlmOcrEngine(cfg, params=params, dtype=jnp.float32,
                            max_seq_len=512)

    # GLM tokenizer must cover the scaffold ids; the fake one does via %
    _rehearse(
        tmp_path, build,
        VisionSettings(336, 336, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
        prompt="<image>read",
    )


def test_dots_weights_day(tmp_path):
    from dsocr_tpu.models.dots import DotsOcrEngine
    from dsocr_tpu.models.dots.config import tiny_dots_config
    from dsocr_tpu.models.dots.loader import load_dots_params
    from tests.test_dots import make_dots_checkpoint

    cfg = tiny_dots_config()
    ckpt = tmp_path / "model.safetensors"
    make_dots_checkpoint(ckpt, cfg)

    def build():
        params = load_dots_params(ckpt, cfg, dtype=jnp.float32)
        return DotsOcrEngine(cfg, params=params, dtype=jnp.float32,
                             max_seq_len=512)

    _rehearse(
        tmp_path, build,
        VisionSettings(28, 56, False),
        DecodeParameters(max_new_tokens=4, no_repeat_ngram_size=None),
        prompt="<image>\nExtract.",
    )
