"""PaddleOCR-VL checkpoint → parameter trees.

Name map mirrors infer-paddleocr/src/{vision/encoder.rs,vision/
projector.rs,transformer/weights.rs}: SigLIP under
`visual.vision_model.*`, projector under `mlp_AR.*`, Ernie under
`model.*` with `lm_head` at the root (absent when tied).
"""

from __future__ import annotations

import pathlib
from typing import Dict

import numpy as np
import jax.numpy as jnp

from ...utils.safetensors_io import CheckpointReader
from .config import PaddleConfig


def _lin(reader, name, dtype):
    w = reader.get(f"{name}.weight", np.float32).T
    b = reader.get_optional(f"{name}.bias", np.float32)
    return {
        "w": jnp.asarray(w, dtype),
        "b": jnp.asarray(b if b is not None else np.zeros(w.shape[-1]), dtype),
    }


def _ln(reader, name, dtype):
    return {
        "w": jnp.asarray(reader.get(f"{name}.weight", np.float32), dtype),
        "b": jnp.asarray(reader.get(f"{name}.bias", np.float32), dtype),
    }


def load_siglip_params(reader: CheckpointReader, cfg: PaddleConfig, dtype=jnp.float32) -> Dict:
    v = cfg.vision_config
    root = "visual.vision_model"
    patch_w = reader.get(f"{root}.embeddings.patch_embedding.weight", np.float32)
    # conv [H, C, p, p] → flattened linear [C*p*p, H]
    patch_w = patch_w.reshape(v.hidden_size, -1).T
    params = {
        "patch_embed": {
            "w": jnp.asarray(patch_w, dtype),
            "b": jnp.asarray(
                reader.get(f"{root}.embeddings.patch_embedding.bias", np.float32),
                dtype,
            ),
        },
        "position_embedding": jnp.asarray(
            reader.get(f"{root}.embeddings.position_embedding.weight", np.float32),
            dtype,
        ),
        "post_layernorm": _ln(reader, f"{root}.post_layernorm", dtype),
        "layers": [],
    }
    for i in range(v.num_hidden_layers):
        blk = f"{root}.encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _ln(reader, f"{blk}.layer_norm1", dtype),
                "ln2": _ln(reader, f"{blk}.layer_norm2", dtype),
                "q": _lin(reader, f"{blk}.self_attn.q_proj", dtype),
                "k": _lin(reader, f"{blk}.self_attn.k_proj", dtype),
                "v": _lin(reader, f"{blk}.self_attn.v_proj", dtype),
                "o": _lin(reader, f"{blk}.self_attn.out_proj", dtype),
                "fc1": _lin(reader, f"{blk}.mlp.fc1", dtype),
                "fc2": _lin(reader, f"{blk}.mlp.fc2", dtype),
            }
        )
    return params


def load_projector_params(reader: CheckpointReader, cfg: PaddleConfig, dtype=jnp.bfloat16) -> Dict:
    return {
        "pre_norm": _ln(reader, "mlp_AR.pre_norm", dtype),
        "linear_1": _lin(reader, "mlp_AR.linear_1", dtype),
        "linear_2": _lin(reader, "mlp_AR.linear_2", dtype),
    }


def load_ernie_params(reader: CheckpointReader, cfg: PaddleConfig, dtype=jnp.bfloat16) -> Dict:
    L = cfg.num_hidden_layers

    def stack(template, transpose=True):
        arrs = []
        for i in range(L):
            w = reader.get(template.format(i=i), np.float32)
            arrs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(arrs), dtype)

    base = "model.layers.{i}."
    params = {
        "embed_tokens": jnp.asarray(
            reader.get("model.embed_tokens.weight", np.float32), dtype
        ),
        "norm": jnp.asarray(reader.get("model.norm.weight", np.float32), dtype),
        "layers": {
            "input_layernorm": stack(base + "input_layernorm.weight", transpose=False),
            "post_attention_layernorm": stack(
                base + "post_attention_layernorm.weight", transpose=False
            ),
            "q_proj": stack(base + "self_attn.q_proj.weight"),
            "k_proj": stack(base + "self_attn.k_proj.weight"),
            "v_proj": stack(base + "self_attn.v_proj.weight"),
            "o_proj": stack(base + "self_attn.o_proj.weight"),
            "gate_proj": stack(base + "mlp.gate_proj.weight"),
            "up_proj": stack(base + "mlp.up_proj.weight"),
            "down_proj": stack(base + "mlp.down_proj.weight"),
        },
    }
    if "lm_head.weight" in reader and not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            reader.get("lm_head.weight", np.float32).T, dtype
        )
    return params


def collect_raw_quant(reader, cfg: PaddleConfig) -> Dict:
    """Raw ggml payloads for the decoder's quantization-eligible linears
    (the reference's paddleocr-vl adapter scope), keyed (group, key) →
    {"method", "layers": [payload per layer]} — packed directly by
    quantize_ernie_params for published-snapshot parity."""
    from ...dsq.serve_quant import collect_raw_plain

    L = cfg.num_hidden_layers
    raw: Dict = {}
    base = "model.layers.{i}."
    for key, suffix in (
        ("q_proj", "self_attn.q_proj"),
        ("k_proj", "self_attn.k_proj"),
        ("v_proj", "self_attn.v_proj"),
        ("o_proj", "self_attn.o_proj"),
        ("gate_proj", "mlp.gate_proj"),
        ("up_proj", "mlp.up_proj"),
        ("down_proj", "mlp.down_proj"),
    ):
        collect_raw_plain(
            reader, raw, "layers", key,
            [(base + suffix).format(i=i) for i in range(L)],
        )
    collect_raw_plain(reader, raw, "", "lm_head", ["lm_head"])
    return raw


def load_paddle_params(
    weights_path: pathlib.Path,
    cfg: PaddleConfig,
    dtype=jnp.bfloat16,
    vision_dtype=jnp.float32,
    snapshot_path: pathlib.Path | None = None,
) -> Dict:
    from ...dsq.runtime import WeightSource

    reader = WeightSource.open(weights_path, snapshot_path)
    params = {
        "vision": load_siglip_params(reader, cfg, vision_dtype),
        "projector": load_projector_params(reader, cfg, dtype),
        "decoder": load_ernie_params(reader, cfg, dtype),
    }
    if snapshot_path is not None:
        raw = collect_raw_quant(reader, cfg)
        if raw:
            params["decoder"]["__raw_quant__"] = raw
    return params
