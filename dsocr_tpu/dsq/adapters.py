"""Model adapters: discover quantizable linears from a model config.

Mirrors crates/dsq-models: `ModelAdapter {id, supports(config),
discover(scope) → [LinearSpec], recommend_dtype}` with a registry that
infers the adapter from config.json contents. Specs use the HF
checkpoint names so snapshots interoperate with the reference's.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import pathlib
from typing import Any, List, Mapping, Optional


class AdapterScope(enum.Enum):
    TEXT = "text"
    TEXT_AND_PROJECTOR = "text+projector"


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    name: str  # checkpoint name WITHOUT the trailing .weight
    out_dim: int
    in_dim: int


class ModelAdapter:
    id: str = ""

    def supports(self, config: Mapping[str, Any]) -> bool:
        raise NotImplementedError

    def discover(self, config: Mapping[str, Any], scope: AdapterScope) -> List[LinearSpec]:
        raise NotImplementedError

    def recommend_dtype(self) -> str:
        return "Q6_K"


class DeepseekOcrAdapter(ModelAdapter):
    id = "deepseek-ocr"

    def supports(self, config) -> bool:
        archs = config.get("architectures") or []
        return any("DeepseekOCR" in a or "deepseek" in a.lower() for a in archs) or (
            "vision_config" in config
            and "sam_vit_b" in (config.get("vision_config", {}).get("width") or {})
        )

    def discover(self, config, scope) -> List[LinearSpec]:
        from ..models.deepseek.config import DeepseekOcrConfig

        cfg = DeepseekOcrConfig.from_dict(config)
        lang = cfg.language
        H = lang.hidden_size
        D = lang.head_dim
        NH = lang.num_attention_heads
        NKV = lang.resolved_kv_heads
        DV = lang.resolved_v_head_dim
        specs: List[LinearSpec] = []
        for i in range(lang.num_hidden_layers):
            base = f"model.layers.{i}"
            specs += [
                LinearSpec(f"{base}.self_attn.q_proj", NH * D, H),
                LinearSpec(f"{base}.self_attn.k_proj", NKV * D, H),
                LinearSpec(f"{base}.self_attn.v_proj", NKV * DV, H),
                LinearSpec(f"{base}.self_attn.o_proj", H, NH * DV),
            ]
            if lang.is_moe_layer(i):
                mi = lang.moe_intermediate_size or lang.intermediate_size
                for e in range(lang.n_routed_experts or 0):
                    eb = f"{base}.mlp.experts.{e}"
                    specs += [
                        LinearSpec(f"{eb}.gate_proj", mi, H),
                        LinearSpec(f"{eb}.up_proj", mi, H),
                        LinearSpec(f"{eb}.down_proj", H, mi),
                    ]
                if lang.n_shared_experts:
                    si = mi * lang.n_shared_experts
                    sb = f"{base}.mlp.shared_experts"
                    specs += [
                        LinearSpec(f"{sb}.gate_proj", si, H),
                        LinearSpec(f"{sb}.up_proj", si, H),
                        LinearSpec(f"{sb}.down_proj", H, si),
                    ]
            else:
                I = lang.intermediate_size
                specs += [
                    LinearSpec(f"{base}.mlp.gate_proj", I, H),
                    LinearSpec(f"{base}.mlp.up_proj", I, H),
                    LinearSpec(f"{base}.mlp.down_proj", H, I),
                ]
        specs.append(LinearSpec("lm_head", lang.vocab_size, H))
        if scope is AdapterScope.TEXT_AND_PROJECTOR:
            specs.append(
                LinearSpec(
                    "model.projector.layers",
                    cfg.projector_n_embed,
                    cfg.projector_input_dim,
                )
            )
        return specs


class PaddleOcrAdapter(ModelAdapter):
    id = "paddleocr-vl"

    def supports(self, config) -> bool:
        archs = config.get("architectures") or []
        return any("PaddleOCR" in a or "Ernie" in a for a in archs)

    def discover(self, config, scope) -> List[LinearSpec]:
        from ..models.paddleocr.config import PaddleConfig

        cfg = PaddleConfig.from_dict(config)
        H = cfg.hidden_size
        D = cfg.head_dim
        NH = cfg.num_attention_heads
        NKV = cfg.resolved_num_key_value_heads
        I = cfg.intermediate_size
        specs: List[LinearSpec] = []
        for i in range(cfg.num_hidden_layers):
            base = f"model.layers.{i}"
            specs += [
                LinearSpec(f"{base}.self_attn.q_proj", NH * D, H),
                LinearSpec(f"{base}.self_attn.k_proj", NKV * D, H),
                LinearSpec(f"{base}.self_attn.v_proj", NKV * D, H),
                LinearSpec(f"{base}.self_attn.o_proj", H, NH * D),
                LinearSpec(f"{base}.mlp.gate_proj", I, H),
                LinearSpec(f"{base}.mlp.up_proj", I, H),
                LinearSpec(f"{base}.mlp.down_proj", H, I),
            ]
        if not cfg.tie_word_embeddings:
            specs.append(LinearSpec("lm_head", cfg.vocab_size, H))
        if scope is AdapterScope.TEXT_AND_PROJECTOR:
            merged = cfg.vision_config.hidden_size * cfg.vision_config.spatial_merge_size**2
            specs += [
                LinearSpec("mlp_AR.linear_1", merged, merged),
                LinearSpec("mlp_AR.linear_2", H, merged),
            ]
        return specs


class DotsOcrAdapter(ModelAdapter):
    id = "dots-ocr"

    def supports(self, config) -> bool:
        archs = config.get("architectures") or []
        return any("Dots" in a for a in archs)

    def discover(self, config, scope) -> List[LinearSpec]:
        H = config.get("hidden_size", 1536)
        D = config.get("head_dim", H // config.get("num_attention_heads", 12))
        NH = config.get("num_attention_heads", 12)
        NKV = config.get("num_key_value_heads", NH)
        I = config.get("intermediate_size", 8960)
        L = config.get("num_hidden_layers", 28)
        specs: List[LinearSpec] = []
        for i in range(L):
            base = f"model.layers.{i}"
            specs += [
                LinearSpec(f"{base}.self_attn.q_proj", NH * D, H),
                LinearSpec(f"{base}.self_attn.k_proj", NKV * D, H),
                LinearSpec(f"{base}.self_attn.v_proj", NKV * D, H),
                LinearSpec(f"{base}.self_attn.o_proj", H, NH * D),
                LinearSpec(f"{base}.mlp.gate_proj", I, H),
                LinearSpec(f"{base}.mlp.up_proj", I, H),
                LinearSpec(f"{base}.mlp.down_proj", H, I),
            ]
        if not config.get("tie_word_embeddings", False):
            specs.append(LinearSpec("lm_head", config.get("vocab_size", 151936), H))
        return specs


ADAPTERS: List[ModelAdapter] = [
    DeepseekOcrAdapter(),
    PaddleOcrAdapter(),
    DotsOcrAdapter(),
]


def infer_adapter(config: Mapping[str, Any]) -> Optional[ModelAdapter]:
    for adapter in ADAPTERS:
        if adapter.supports(config):
            return adapter
    return None


def infer_adapter_from_path(config_path: pathlib.Path) -> Optional[ModelAdapter]:
    return infer_adapter(json.loads(pathlib.Path(config_path).read_text()))
