"""DotsOCR checkpoint → parameter trees (sharded-index safetensors).

Name map mirrors infer-dots: vision under `vision_tower.*` (patchifier,
blocks, post_trunk_norm, merger.mlp.{0,2}), Qwen2 under `model.*` with
q/k/v biases, `lm_head` at the root.
"""

from __future__ import annotations

import pathlib
from typing import Dict

import numpy as np
import jax.numpy as jnp

from .config import DotsConfig


def _lin(reader, name, dtype, bias=True):
    w = reader.get(f"{name}.weight", np.float32).T
    out = {"w": jnp.asarray(w, dtype)}
    b = reader.get_optional(f"{name}.bias", np.float32) if bias else None
    out["b"] = jnp.asarray(b, dtype) if b is not None else None
    return out


def load_dots_vision_params(reader, cfg: DotsConfig, dtype=jnp.float32) -> Dict:
    v = cfg.vision
    root = "vision_tower"
    params = {
        "patch_embed": {
            "w": jnp.asarray(
                reader.get(f"{root}.patch_embed.patchifier.proj.weight", np.float32),
                dtype,
            ),
            "b": jnp.asarray(
                reader.get_optional(f"{root}.patch_embed.patchifier.proj.bias", np.float32)
                if f"{root}.patch_embed.patchifier.proj.bias" in reader
                else np.zeros(v.embed_dim),
                dtype,
            ),
            "norm": jnp.asarray(
                reader.get(f"{root}.patch_embed.patchifier.norm.weight", np.float32),
                dtype,
            ),
        },
        "post_trunk_norm": (
            jnp.asarray(reader.get(f"{root}.post_trunk_norm.weight", np.float32), dtype)
            if v.post_norm
            else None
        ),
        "merger": {
            "ln_q": {
                "w": jnp.asarray(reader.get(f"{root}.merger.ln_q.weight", np.float32), dtype),
                "b": jnp.asarray(reader.get(f"{root}.merger.ln_q.bias", np.float32), dtype),
            },
            "mlp_in": _lin(reader, f"{root}.merger.mlp.0", dtype),
            "mlp_out": _lin(reader, f"{root}.merger.mlp.2", dtype),
        },
        "blocks": [],
    }
    for i in range(v.num_hidden_layers):
        blk = f"{root}.blocks.{i}"
        params["blocks"].append(
            {
                "norm1": jnp.asarray(reader.get(f"{blk}.norm1.weight", np.float32), dtype),
                "norm2": jnp.asarray(reader.get(f"{blk}.norm2.weight", np.float32), dtype),
                "qkv": _lin(reader, f"{blk}.attn.qkv", dtype, bias=v.use_bias),
                "proj": _lin(reader, f"{blk}.attn.proj", dtype, bias=v.use_bias),
                "fc1": _lin(reader, f"{blk}.mlp.fc1", dtype, bias=v.use_bias),
                "fc2": _lin(reader, f"{blk}.mlp.fc2", dtype, bias=v.use_bias),
                "fc3": _lin(reader, f"{blk}.mlp.fc3", dtype, bias=v.use_bias),
            }
        )
    return params


def load_qwen2_params(reader, cfg: DotsConfig, dtype=jnp.bfloat16) -> Dict:
    t = cfg.text
    L = t.num_hidden_layers

    def stack(template, transpose=True):
        arrs = []
        for i in range(L):
            w = reader.get(template.format(i=i), np.float32)
            arrs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(arrs), dtype)

    base = "model.layers.{i}."
    layers = {
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
    }
    if t.attention_bias and "model.layers.0.self_attn.q_proj.bias" in reader:
        layers["q_bias"] = stack(base + "self_attn.q_proj.bias", transpose=False)
        layers["k_bias"] = stack(base + "self_attn.k_proj.bias", transpose=False)
        layers["v_bias"] = stack(base + "self_attn.v_proj.bias", transpose=False)
    params = {
        "embed_tokens": jnp.asarray(
            reader.get("model.embed_tokens.weight", np.float32), dtype
        ),
        "norm": jnp.asarray(reader.get("model.norm.weight", np.float32), dtype),
        "layers": layers,
    }
    if "lm_head.weight" in reader and not t.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            reader.get("lm_head.weight", np.float32).T, dtype
        )
    return params


def collect_raw_quant(reader, cfg: DotsConfig) -> Dict:
    """Raw ggml payloads for the decoder's quantization-eligible linears
    (the reference's dots adapter scope), keyed (group, key) →
    {"method", "layers": [payload per layer]} — packed directly by
    quantize_qwen2_params for published-snapshot parity."""
    from ...dsq.serve_quant import collect_raw_plain

    L = cfg.text.num_hidden_layers
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


def load_dots_params(
    weights_path: pathlib.Path,
    cfg: DotsConfig,
    dtype=jnp.bfloat16,
    vision_dtype=jnp.float32,
    snapshot_path: pathlib.Path | None = None,
) -> Dict:
    from ...dsq.runtime import WeightSource

    reader = WeightSource.open(weights_path, snapshot_path)
    params = {
        "vision": load_dots_vision_params(reader, cfg, vision_dtype),
        "decoder": load_qwen2_params(reader, cfg, dtype),
    }
    if snapshot_path is not None:
        raw = collect_raw_quant(reader, cfg)
        if raw:
            params["decoder"]["__raw_quant__"] = raw
    return params
