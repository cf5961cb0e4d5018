"""DeepSeek-OCR checkpoint → parameter trees.

Name map mirrors the reference loader (infer-deepseek/src/transformer/
weights.rs:22-639 and model/mod.rs:946-1105): HF names under `model.*`
(sam_model, vision_model, projector, layers.N...), lm_head at the root.
Per-layer weights are stacked into [L, ...] arrays and linear weights
transposed [out, in] → [in, out] for our row-major matmuls.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ...utils.safetensors_io import CheckpointReader
from .config import DeepseekOcrConfig, vision_compute_dtype
from .decoder import _split_layers


def _lin(reader, name, dtype, transpose=True):
    w = reader.get(f"{name}.weight", np.float32)
    if transpose:
        w = w.T
    b = reader.get_optional(f"{name}.bias", np.float32)
    out = {"w": jnp.asarray(w, dtype)}
    out["b"] = jnp.asarray(b, dtype) if b is not None else jnp.zeros(w.shape[-1], dtype)
    return out


def _ln(reader, name, dtype):
    return {
        "w": jnp.asarray(reader.get(f"{name}.weight", np.float32), dtype),
        "b": jnp.asarray(reader.get(f"{name}.bias", np.float32), dtype),
    }


def load_sam_params(reader: CheckpointReader, cfg: DeepseekOcrConfig, dtype=jnp.float32) -> Dict:
    p = cfg.sam
    root = "model.sam_model"
    params = {
        "patch_embed": {
            "w": jnp.asarray(reader.get(f"{root}.patch_embed.proj.weight", np.float32), dtype),
            "b": jnp.asarray(reader.get(f"{root}.patch_embed.proj.bias", np.float32), dtype),
        },
        "pos_embed": jnp.asarray(reader.get(f"{root}.pos_embed", np.float32), dtype),
        "neck": {
            "conv1": jnp.asarray(reader.get(f"{root}.neck.0.weight", np.float32), dtype),
            "norm1": _ln(reader, f"{root}.neck.1", dtype),
            "conv2": jnp.asarray(reader.get(f"{root}.neck.2.weight", np.float32), dtype),
            "norm2": _ln(reader, f"{root}.neck.3", dtype),
        },
        "net_2": jnp.asarray(reader.get(f"{root}.net_2.weight", np.float32), dtype),
        "net_3": jnp.asarray(reader.get(f"{root}.net_3.weight", np.float32), dtype),
        "blocks": [],
    }
    for i in range(p.depth):
        blk = f"{root}.blocks.{i}"
        mlp1 = f"{blk}.mlp.fc1" if f"{blk}.mlp.fc1.weight" in reader else f"{blk}.mlp.lin1"
        mlp2 = f"{blk}.mlp.fc2" if f"{blk}.mlp.fc2.weight" in reader else f"{blk}.mlp.lin2"
        params["blocks"].append(
            {
                "norm1": _ln(reader, f"{blk}.norm1", dtype),
                "norm2": _ln(reader, f"{blk}.norm2", dtype),
                "qkv": _lin(reader, f"{blk}.attn.qkv", dtype),
                "proj": _lin(reader, f"{blk}.attn.proj", dtype),
                "rel_pos_h": jnp.asarray(reader.get(f"{blk}.attn.rel_pos_h", np.float32), dtype),
                "rel_pos_w": jnp.asarray(reader.get(f"{blk}.attn.rel_pos_w", np.float32), dtype),
                "fc1": _lin(reader, mlp1, dtype),
                "fc2": _lin(reader, mlp2, dtype),
            }
        )
    return params


def load_clip_params(reader: CheckpointReader, cfg: DeepseekOcrConfig, dtype=jnp.float32) -> Dict:
    p = cfg.clip
    root = "model.vision_model"
    params = {
        "class_embedding": jnp.asarray(
            reader.get(f"{root}.embeddings.class_embedding", np.float32), dtype
        ),
        "position_embedding": jnp.asarray(
            reader.get(f"{root}.embeddings.position_embedding.weight", np.float32),
            dtype,
        ),
        "pre_layernorm": _ln(reader, f"{root}.pre_layrnorm", dtype),  # sic
        "layers": [],
    }
    for i in range(p.num_layers):
        blk = f"{root}.transformer.layers.{i}"
        params["layers"].append(
            {
                "ln1": _ln(reader, f"{blk}.layer_norm1", dtype),
                "ln2": _ln(reader, f"{blk}.layer_norm2", dtype),
                "qkv": _lin(reader, f"{blk}.self_attn.qkv_proj", dtype),
                "out": _lin(reader, f"{blk}.self_attn.out_proj", dtype),
                "fc1": _lin(reader, f"{blk}.mlp.fc1", dtype),
                "fc2": _lin(reader, f"{blk}.mlp.fc2", dtype),
            }
        )
    return params


def load_projector_params(
    reader: CheckpointReader, cfg: DeepseekOcrConfig, dtype=jnp.bfloat16
) -> Dict:
    n = cfg.projector_n_embed
    bias = reader.get_optional("model.projector.layers.bias", np.float32)
    newline = reader.get_optional("model.image_newline", np.float32)
    sep = reader.get_optional("model.view_seperator", np.float32)
    return {
        "weight": jnp.asarray(
            reader.get("model.projector.layers.weight", np.float32).T, dtype
        ),
        "bias": jnp.asarray(bias, dtype) if bias is not None else None,
        "image_newline": jnp.asarray(
            newline if newline is not None else np.zeros(n, np.float32), dtype
        ),
        "view_seperator": jnp.asarray(
            sep if sep is not None else np.zeros(n, np.float32), dtype
        ),
    }


def load_ocr2_params(reader: CheckpointReader, enc_params, dtype=jnp.float32) -> Dict:
    """OCR2 Qwen2 decoder-as-encoder weights (ref vision/qwen2.rs:117-145):
    core stack under model.qwen2_model.model.model.*, query embeddings at
    model.qwen2_model.query_{768,1024}.weight, shared projector name."""
    L = enc_params.num_layers
    root = "model.qwen2_model"
    core = f"{root}.model.model"

    def stack(template, transpose=True):
        arrs = []
        for i in range(L):
            w = reader.get(template.format(i=i), np.float32)
            arrs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(arrs), dtype)

    base = core + ".layers.{i}."
    layers = {
        "input_layernorm": stack(base + "input_layernorm.weight", transpose=False),
        "post_attention_layernorm": stack(
            base + "post_attention_layernorm.weight", transpose=False
        ),
        "q_proj": stack(base + "self_attn.q_proj.weight"),
        "k_proj": stack(base + "self_attn.k_proj.weight"),
        "v_proj": stack(base + "self_attn.v_proj.weight"),
        "o_proj": stack(base + "self_attn.o_proj.weight"),
        "q_bias": stack(base + "self_attn.q_proj.bias", transpose=False),
        "k_bias": stack(base + "self_attn.k_proj.bias", transpose=False),
        "v_bias": stack(base + "self_attn.v_proj.bias", transpose=False),
        "gate_proj": stack(base + "mlp.gate_proj.weight"),
        "up_proj": stack(base + "mlp.up_proj.weight"),
        "down_proj": stack(base + "mlp.down_proj.weight"),
    }
    sep = reader.get_optional("model.view_seperator", np.float32)
    return {
        "layers": layers,
        "norm": jnp.asarray(reader.get(f"{core}.norm.weight", np.float32), dtype),
        "query_768": jnp.asarray(
            reader.get(f"{root}.query_768.weight", np.float32), dtype
        ),
        "query_1024": jnp.asarray(
            reader.get(f"{root}.query_1024.weight", np.float32), dtype
        ),
        "projector": {
            "w": jnp.asarray(
                reader.get("model.projector.layers.weight", np.float32).T, dtype
            ),
            "b": jnp.asarray(
                reader.get_optional("model.projector.layers.bias", np.float32)
                if "model.projector.layers.bias" in reader
                else np.zeros(enc_params.projector_out),
                dtype,
            ),
        },
        "view_seperator": jnp.asarray(
            sep if sep is not None else np.zeros(enc_params.projector_out), dtype
        ),
    }


def load_decoder_params(
    reader: CheckpointReader, cfg: DeepseekOcrConfig, dtype=jnp.bfloat16
) -> Dict:
    lang = cfg.language
    num_dense, num_moe = _split_layers(lang)

    def stack_lin(indices, template, transpose=True):
        arrs = []
        for i in indices:
            w = reader.get(template.format(i=i), np.float32)
            arrs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(arrs), dtype)

    def attn_stack(indices):
        base = "model.layers.{i}."
        return {
            "input_layernorm": stack_lin(
                indices, base + "input_layernorm.weight", transpose=False
            ),
            "post_attention_layernorm": stack_lin(
                indices, base + "post_attention_layernorm.weight", transpose=False
            ),
            "q_proj": stack_lin(indices, base + "self_attn.q_proj.weight"),
            "k_proj": stack_lin(indices, base + "self_attn.k_proj.weight"),
            "v_proj": stack_lin(indices, base + "self_attn.v_proj.weight"),
            "o_proj": stack_lin(indices, base + "self_attn.o_proj.weight"),
        }

    params: Dict = {
        "embed_tokens": jnp.asarray(
            reader.get("model.embed_tokens.weight", np.float32), dtype
        ),
        "norm": jnp.asarray(reader.get("model.norm.weight", np.float32), dtype),
        "lm_head": jnp.asarray(reader.get("lm_head.weight", np.float32).T, dtype),
    }
    dense_idx = list(range(num_dense))
    moe_idx = list(range(num_dense, num_dense + num_moe))
    if dense_idx:
        params["dense_layers"] = {
            **attn_stack(dense_idx),
            "gate_proj": stack_lin(dense_idx, "model.layers.{i}.mlp.gate_proj.weight"),
            "up_proj": stack_lin(dense_idx, "model.layers.{i}.mlp.up_proj.weight"),
            "down_proj": stack_lin(dense_idx, "model.layers.{i}.mlp.down_proj.weight"),
        }
    if moe_idx:
        E = lang.n_routed_experts

        def stack_experts(proj):
            per_layer = []
            for i in moe_idx:
                experts = [
                    reader.get(
                        f"model.layers.{i}.mlp.experts.{e}.{proj}.weight", np.float32
                    ).T
                    for e in range(E)
                ]
                per_layer.append(np.stack(experts))
            return jnp.asarray(np.stack(per_layer), dtype)

        moe = {
            **attn_stack(moe_idx),
            "gate_weight": stack_lin(
                moe_idx, "model.layers.{i}.mlp.gate.weight", transpose=False
            ),
            "experts_gate": stack_experts("gate_proj"),
            "experts_up": stack_experts("up_proj"),
            "experts_down": stack_experts("down_proj"),
        }
        bias_name = f"model.layers.{moe_idx[0]}.mlp.gate.e_score_correction_bias"
        if bias_name in reader:
            moe["gate_bias"] = stack_lin(
                moe_idx,
                "model.layers.{i}.mlp.gate.e_score_correction_bias",
                transpose=False,
            )
        if f"model.layers.{moe_idx[0]}.mlp.shared_experts.gate_proj.weight" in reader:
            moe["shared_gate"] = stack_lin(
                moe_idx, "model.layers.{i}.mlp.shared_experts.gate_proj.weight"
            )
            moe["shared_up"] = stack_lin(
                moe_idx, "model.layers.{i}.mlp.shared_experts.up_proj.weight"
            )
            moe["shared_down"] = stack_lin(
                moe_idx, "model.layers.{i}.mlp.shared_experts.down_proj.weight"
            )
        params["moe_layers"] = moe
    return params


def collect_raw_quant(reader, cfg: DeepseekOcrConfig) -> Dict:
    """Raw ggml payloads for quantization-eligible decoder linears, keyed
    (group, key) → {"method", "layers": [payload per layer]} (expert keys
    nest per-expert: "layers": [[payload per expert] per layer]).

    Feeding these straight into the Pallas packers serves the snapshot's
    PUBLISHED codes — the reference's QMatMul reads the same bytes
    (dsq-runtime/src/lib.rs:316-369) — and skips the k-quant
    dequantize→requantize round trip, which unlike Q8_0's is not
    guaranteed bit-exact."""
    lang = cfg.language
    num_dense, num_moe = _split_layers(lang)
    dense_idx = list(range(num_dense))
    moe_idx = list(range(num_dense, num_dense + num_moe))
    raw: Dict = {}

    def plain(group, key, template, indices):
        hits = [reader.raw_quant(template.format(i=i) + ".weight") for i in indices]
        if not hits or any(h is None for h in hits):
            return
        dtypes = {h[1] for h in hits}
        if len(dtypes) != 1:
            return
        raw[(group, key)] = {
            "method": hits[0][1].lower(),
            "layers": [h[0] for h in hits],
        }

    def experts(group, key, proj, indices):
        E = lang.n_routed_experts
        layers = []
        dtypes = set()
        for i in indices:
            per_expert = [
                reader.raw_quant(
                    f"model.layers.{i}.mlp.experts.{e}.{proj}.weight"
                )
                for e in range(E)
            ]
            if any(h is None for h in per_expert):
                return
            dtypes.update(h[1] for h in per_expert)
            layers.append([h[0] for h in per_expert])
        if layers and len(dtypes) == 1:
            raw[(group, key)] = {
                "method": dtypes.pop().lower(),
                "layers": layers,
            }

    for group, indices in (("dense_layers", dense_idx), ("moe_layers", moe_idx)):
        if not indices:
            continue
        base = "model.layers.{i}."
        for key, suffix in (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("o_proj", "self_attn.o_proj"),
        ):
            plain(group, key, base + suffix, indices)
        if group == "moe_layers":
            for key, suffix in (
                ("shared_gate", "mlp.shared_experts.gate_proj"),
                ("shared_up", "mlp.shared_experts.up_proj"),
                ("shared_down", "mlp.shared_experts.down_proj"),
            ):
                plain(group, key, base + suffix, indices)
            for key, proj in (
                ("experts_gate", "gate_proj"),
                ("experts_up", "up_proj"),
                ("experts_down", "down_proj"),
            ):
                experts(group, key, proj, indices)
    head = reader.raw_quant("lm_head.weight")
    if head is not None:
        raw[("", "lm_head")] = {"method": head[1].lower(), "layers": [head[0]]}
    return raw


def load_deepseek_params(
    weights_path: pathlib.Path,
    cfg: DeepseekOcrConfig,
    dtype=jnp.bfloat16,
    vision_dtype=None,
    snapshot_path: pathlib.Path | None = None,
) -> Dict:
    """Full parameter tree from a safetensors checkpoint. Vision tower
    dtype defaults via vision_compute_dtype (bf16 on TPU; the reference
    keeps duplicate f32 copies instead — model/mod.rs:981-1052). A DSQ
    snapshot overrides matching linears (dequantize-on-load for float
    serving; quantized serving reuses the raw payloads — see
    collect_raw_quant)."""
    from ...dsq.runtime import WeightSource

    if vision_dtype is None:
        vision_dtype = vision_compute_dtype(dtype)
    reader = WeightSource.open(weights_path, snapshot_path)
    params = {
        "sam": load_sam_params(reader, cfg, vision_dtype),
        "decoder": load_decoder_params(reader, cfg, dtype),
    }
    if snapshot_path is not None:
        raw = collect_raw_quant(reader, cfg)
        if raw:
            params["decoder"]["__raw_quant__"] = raw
    if cfg.variant == "ocr2":
        from .ocr2 import Qwen2EncoderParams

        params["ocr2"] = load_ocr2_params(reader, Qwen2EncoderParams(), vision_dtype)
    else:
        params["clip"] = load_clip_params(reader, cfg, vision_dtype) if cfg.clip else None
        params["projector"] = load_projector_params(reader, cfg, dtype)
    return params
