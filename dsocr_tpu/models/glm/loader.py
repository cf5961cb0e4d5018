"""GLM-OCR checkpoint → parameter trees.

Names (ref infer-glm): vision under `model.visual.*` (patch_embed.proj,
blocks.N.{norm1,norm2,attn.{qkv,proj,q_norm,k_norm},mlp.{gate,up,down}_proj},
post_layernorm, downsample, merger.{proj,post_projection_norm,gate_proj,
up_proj,down_proj}), text under `model.language_model.*` with sandwich
norms and fused gate_up_proj, `lm_head` at the root.
"""

from __future__ import annotations

import pathlib
from typing import Dict

import numpy as np
import jax.numpy as jnp

from .config import GlmConfig


def _lin(reader, name, dtype, bias=True):
    w = reader.get(f"{name}.weight", np.float32).T
    out = {"w": jnp.asarray(w, dtype)}
    b = reader.get_optional(f"{name}.bias", np.float32) if bias else None
    out["b"] = jnp.asarray(b, dtype) if b is not None else None
    return out


def load_glm_vision_params(reader, cfg: GlmConfig, dtype=jnp.float32) -> Dict:
    v = cfg.vision
    root = "model.visual"
    patch_w = reader.get(f"{root}.patch_embed.proj.weight", np.float32)
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2
    params = {
        "patch_embed": {
            "w": jnp.asarray(patch_w.reshape(v.hidden_size, patch_dim).T, dtype),
            "b": jnp.asarray(
                reader.get_optional(f"{root}.patch_embed.proj.bias", np.float32)
                if f"{root}.patch_embed.proj.bias" in reader
                else np.zeros(v.hidden_size),
                dtype,
            ),
        },
        "post_layernorm": jnp.asarray(
            reader.get(f"{root}.post_layernorm.weight", np.float32), dtype
        ),
        "downsample": jnp.asarray(
            reader.get(f"{root}.downsample.weight", np.float32), dtype
        ),
        "merger": {
            "proj": _lin(reader, f"{root}.merger.proj", dtype, bias=False),
            "norm": {
                "w": jnp.asarray(
                    reader.get(f"{root}.merger.post_projection_norm.weight", np.float32),
                    dtype,
                ),
                "b": jnp.asarray(
                    reader.get(f"{root}.merger.post_projection_norm.bias", np.float32),
                    dtype,
                ),
            },
            "gate": _lin(reader, f"{root}.merger.gate_proj", dtype, bias=False),
            "up": _lin(reader, f"{root}.merger.up_proj", dtype, bias=False),
            "down": _lin(reader, f"{root}.merger.down_proj", dtype, bias=False),
        },
        "blocks": [],
    }
    for i in range(v.depth):
        blk = f"{root}.blocks.{i}"
        params["blocks"].append(
            {
                "norm1": jnp.asarray(reader.get(f"{blk}.norm1.weight", np.float32), dtype),
                "norm2": jnp.asarray(reader.get(f"{blk}.norm2.weight", np.float32), dtype),
                "qkv": _lin(reader, f"{blk}.attn.qkv", dtype, bias=v.attention_bias),
                "proj": _lin(reader, f"{blk}.attn.proj", dtype, bias=v.attention_bias),
                "q_norm": jnp.asarray(reader.get(f"{blk}.attn.q_norm.weight", np.float32), dtype),
                "k_norm": jnp.asarray(reader.get(f"{blk}.attn.k_norm.weight", np.float32), dtype),
                "gate_proj": _lin(reader, f"{blk}.mlp.gate_proj", dtype, bias=v.attention_bias),
                "up_proj": _lin(reader, f"{blk}.mlp.up_proj", dtype, bias=v.attention_bias),
                "down_proj": _lin(reader, f"{blk}.mlp.down_proj", dtype, bias=v.attention_bias),
            }
        )
    return params


def load_glm_text_params(reader, cfg: GlmConfig, dtype=jnp.bfloat16) -> Dict:
    t = cfg.text
    L = t.num_hidden_layers
    root = "model.language_model"

    def stack(template, transpose=True):
        arrs = []
        for i in range(L):
            w = reader.get(template.format(i=i), np.float32)
            arrs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(arrs), dtype)

    base = root + ".layers.{i}."
    layers = {
        "input_layernorm": stack(base + "input_layernorm.weight", transpose=False),
        "post_attention_layernorm": stack(
            base + "post_attention_layernorm.weight", transpose=False
        ),
        "post_self_attn_layernorm": stack(
            base + "post_self_attn_layernorm.weight", transpose=False
        ),
        "post_mlp_layernorm": stack(base + "post_mlp_layernorm.weight", transpose=False),
        "q_proj": stack(base + "self_attn.q_proj.weight"),
        "k_proj": stack(base + "self_attn.k_proj.weight"),
        "v_proj": stack(base + "self_attn.v_proj.weight"),
        "o_proj": stack(base + "self_attn.o_proj.weight"),
        "gate_up_proj": stack(base + "mlp.gate_up_proj.weight"),
        "down_proj": stack(base + "mlp.down_proj.weight"),
    }
    if t.attention_bias and f"{root}.layers.0.self_attn.q_proj.bias" in reader:
        layers["q_bias"] = stack(base + "self_attn.q_proj.bias", transpose=False)
        layers["k_bias"] = stack(base + "self_attn.k_proj.bias", transpose=False)
        layers["v_bias"] = stack(base + "self_attn.v_proj.bias", transpose=False)
    params = {
        "embed_tokens": jnp.asarray(
            reader.get(f"{root}.embed_tokens.weight", np.float32), dtype
        ),
        "norm": jnp.asarray(reader.get(f"{root}.norm.weight", np.float32), dtype),
        "layers": layers,
    }
    if "lm_head.weight" in reader and not t.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            reader.get("lm_head.weight", np.float32).T, dtype
        )
    return params


def load_glm_params(
    weights_path: pathlib.Path,
    cfg: GlmConfig,
    dtype=jnp.bfloat16,
    vision_dtype=jnp.float32,
    snapshot_path: pathlib.Path | None = None,
) -> Dict:
    from ...dsq.runtime import WeightSource

    reader = WeightSource.open(weights_path, snapshot_path)
    return {
        "vision": load_glm_vision_params(reader, cfg, vision_dtype),
        "decoder": load_glm_text_params(reader, cfg, dtype),
    }
