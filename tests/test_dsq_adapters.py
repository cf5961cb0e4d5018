"""DSQ adapters + export CLI (contracts: crates/dsq-models/tests/adapters.rs,
crates/dsq-cli/tests/basic.rs)."""

import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from dsocr_tpu.dsq.adapters import (
    AdapterScope,
    DeepseekOcrAdapter,
    PaddleOcrAdapter,
    infer_adapter,
)
from dsocr_tpu.dsq.cli import main as dsq_main
from dsocr_tpu.dsq.format import DsqReader


DEEPSEEK_CONFIG = {
    "architectures": ["DeepseekOCRForCausalLM"],
    "vocab_size": 128,
    "hidden_size": 32,
    "intermediate_size": 64,
    "moe_intermediate_size": 256,  # multiple of 256 so Q6_K applies
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "n_routed_experts": 2,
    "n_shared_experts": 1,
    "num_experts_per_tok": 2,
    "first_k_dense_replace": 1,
    "max_position_embeddings": 512,
    "projector_config": {"input_dim": 32, "n_embed": 32, "projector_type": "linear"},
    "vision_config": {"width": {"sam_vit_b": {}, "clip-l-14-224": {"width": 16}}},
}

PADDLE_CONFIG = {
    "architectures": ["PaddleOCRVLForConditionalGeneration"],
    "hidden_size": 32,
    "head_dim": 8,
    "intermediate_size": 64,
    "vocab_size": 128,
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "num_key_value_heads": 2,
    "max_position_embeddings": 512,
    "tie_word_embeddings": True,
    "vision_config": {"hidden_size": 16, "patch_size": 14},
}


def test_infer_adapter():
    assert infer_adapter(DEEPSEEK_CONFIG).id == "deepseek-ocr"
    assert infer_adapter(PADDLE_CONFIG).id == "paddleocr-vl"
    assert infer_adapter({"architectures": ["Bogus"]}) is None


def test_deepseek_discovery_counts():
    specs = DeepseekOcrAdapter().discover(DEEPSEEK_CONFIG, AdapterScope.TEXT)
    names = [s.name for s in specs]
    # layer 0 dense: 4 attn + 3 mlp; layer 1 moe: 4 attn + 2*3 experts + 3 shared
    assert "model.layers.0.mlp.gate_proj" in names
    assert "model.layers.1.mlp.experts.1.down_proj" in names
    assert "model.layers.1.mlp.shared_experts.up_proj" in names
    assert "lm_head" in names
    assert "model.projector.layers" not in names
    specs2 = DeepseekOcrAdapter().discover(
        DEEPSEEK_CONFIG, AdapterScope.TEXT_AND_PROJECTOR
    )
    assert any(s.name == "model.projector.layers" for s in specs2)


def test_paddle_discovery_tied_embeddings_no_lm_head():
    specs = PaddleOcrAdapter().discover(PADDLE_CONFIG, AdapterScope.TEXT)
    assert not any(s.name == "lm_head" for s in specs)
    assert len(specs) == 2 * 7


def test_export_cli_roundtrip(tmp_path):
    # tiny checkpoint with one quantizable linear (in_dim 256)
    cfg = dict(PADDLE_CONFIG, hidden_size=256, head_dim=64, intermediate_size=256,
               num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4)
    tensors = {}
    rng = np.random.default_rng(0)
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        tensors[f"model.layers.0.self_attn.{proj}.weight"] = rng.normal(
            size=(256, 256)
        ).astype(np.float32)
    for proj in ("gate_proj", "up_proj", "down_proj"):
        tensors[f"model.layers.0.mlp.{proj}.weight"] = rng.normal(
            size=(256, 256)
        ).astype(np.float32)
    weights_path = tmp_path / "model.safetensors"
    save_file(tensors, str(weights_path))
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(cfg))
    out_path = tmp_path / "snap.dsq"

    rc = dsq_main(
        [
            "export",
            "--weights", str(weights_path),
            "--config", str(config_path),
            "--dtype", "q6k",
            "--output", str(out_path),
        ]
    )
    assert rc == 0
    reader = DsqReader(out_path)
    assert reader.header.default_qdtype == "Q6_K"
    assert reader.header.tensor_count == 7
    deq = reader.dequantize("model.layers.0.self_attn.q_proj")
    orig = tensors["model.layers.0.self_attn.q_proj.weight"]
    assert np.corrcoef(deq.reshape(-1), orig.reshape(-1))[0, 1] > 0.995
    reader.close()

    # info + stats smoke
    assert dsq_main(["info", str(out_path)]) == 0
    assert dsq_main(["stats", str(out_path)]) == 0


def test_snapshot_overrides_loader_weights(tmp_path):
    """Quantized snapshot linears override checkpoint floats at load
    (ref dsq-runtime SnapshotLoadPlan semantics)."""
    import jax.numpy as jnp
    from dsocr_tpu.dsq.format import DsqWriter
    from dsocr_tpu.models.paddleocr.config import tiny_paddle_config
    from dsocr_tpu.models.paddleocr.loader import load_paddle_params
    from tests.test_loaders import _make_paddle_checkpoint

    ckpt = tmp_path / "model.safetensors"
    cfg, tensors = _make_paddle_checkpoint(ckpt)

    snap_path = tmp_path / "snap.dsq"
    writer = DsqWriter(model_id="t", default_qdtype="Q8_0")
    # override layer 0 q_proj (shape [NH*D, H] = [64, 64], in_dim 64 ok for Q8_0)
    override = np.full_like(tensors["model.layers.0.self_attn.q_proj.weight"], 0.5)
    writer.quantize_and_add("model.layers.0.self_attn.q_proj", override, "Q8_0")
    writer.finalize(snap_path)

    params = load_paddle_params(ckpt, cfg, dtype=jnp.float32, snapshot_path=snap_path)
    q0 = np.asarray(params["decoder"]["layers"]["q_proj"][0])
    np.testing.assert_allclose(q0, 0.5, atol=1e-3)  # quantized round-trip of 0.5
    # other layers untouched
    q1 = np.asarray(params["decoder"]["layers"]["q_proj"][1])
    np.testing.assert_allclose(q1, tensors["model.layers.1.self_attn.q_proj.weight"].T)
