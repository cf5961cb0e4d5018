"""DeepSeek-OCR v2 vision path: SAM features → Qwen2 decoder-as-encoder
with learned query tokens → linear projector.

Mirrors infer-deepseek/src/vision/qwen2.rs: the [image_tokens ‖ query
tokens] sequence runs through a Qwen2-0.5B stack (24L, hidden 896, 14/2
GQA heads, θ=1e6, qkv bias) with a custom mask — image tokens attend
only to image tokens; query tokens attend to all image tokens plus
causally to earlier queries — and the refined query half projects to
n_embed=1280. Query embeddings: 144 rows for 768px views, 256 for
1024px.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import attention, rms_norm
from ...ops.rope import apply_rope, build_rope_tables


@dataclasses.dataclass(frozen=True)
class Qwen2EncoderParams:
    num_layers: int = 24
    hidden_size: int = 896
    num_heads: int = 14
    num_kv_heads: int = 2
    intermediate_size: int = 4864
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    query_768: int = 144
    query_1024: int = 256
    projector_out: int = 1280

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_qwen2_encoder_params() -> Qwen2EncoderParams:
    return Qwen2EncoderParams(
        num_layers=2,
        hidden_size=16,
        num_heads=2,
        num_kv_heads=1,
        intermediate_size=32,
        rope_theta=10000.0,
        query_768=4,
        query_1024=16,
        projector_out=32,
    )


def init_ocr2_params(p: Qwen2EncoderParams, key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 14))
    H, D = p.hidden_size, p.head_dim
    NH, NKV, I, L = p.num_heads, p.num_kv_heads, p.intermediate_size, p.num_layers

    def stack(k, shape, scale):
        return (jax.random.normal(k, (L, *shape)) * scale).astype(dtype)

    return {
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "q_proj": stack(next(keys), (H, NH * D), H**-0.5),
            "k_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "v_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "o_proj": stack(next(keys), (NH * D, H), (NH * D) ** -0.5),
            "q_bias": jnp.zeros((L, NH * D), dtype),
            "k_bias": jnp.zeros((L, NKV * D), dtype),
            "v_bias": jnp.zeros((L, NKV * D), dtype),
            "gate_proj": stack(next(keys), (H, I), H**-0.5),
            "up_proj": stack(next(keys), (H, I), H**-0.5),
            "down_proj": stack(next(keys), (I, H), I**-0.5),
        },
        "norm": jnp.ones((H,), dtype),
        "query_768": (jax.random.normal(next(keys), (p.query_768, H)) * 0.02).astype(dtype),
        "query_1024": (jax.random.normal(next(keys), (p.query_1024, H)) * 0.02).astype(dtype),
        "projector": {
            "w": (jax.random.normal(next(keys), (H, p.projector_out)) * (H**-0.5)).astype(dtype),
            "b": jnp.zeros((p.projector_out,), dtype),
        },
        "view_seperator": (
            jax.random.normal(next(keys), (p.projector_out,)) * 0.02
        ).astype(dtype),
    }


def ocr2_attention_mask(seq: int) -> jnp.ndarray:
    """[2S, 2S] bool (ref build_custom_attention_mask, qwen2.rs:519-560):
    image rows (first S) attend image cols; query rows attend all image
    cols + causal over queries."""
    total = 2 * seq
    rows = np.arange(total)[:, None]
    cols = np.arange(total)[None, :]
    is_image_col = cols < seq
    image_rows = (rows < seq) & is_image_col
    query_rows = (rows >= seq) & (is_image_col | (cols <= rows))
    return jnp.asarray(image_rows | query_rows)


def _proj(x, w, b=None):
    out = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def ocr2_encode_view(
    params: Dict,
    p: Qwen2EncoderParams,
    sam_features: jnp.ndarray,  # [B, hidden, g, g]
) -> jnp.ndarray:
    """Returns projected query tokens [B, S, projector_out] where
    S = g² (144 or 256)."""
    b, hidden, gh, gw = sam_features.shape
    seq = gh * gw
    tokens = sam_features.reshape(b, hidden, seq).transpose(0, 2, 1)
    if seq == p.query_768:
        query = params["query_768"]
    elif seq == p.query_1024:
        query = params["query_1024"]
    else:
        raise ValueError(
            f"unsupported Qwen2 query length {seq} "
            f"(expected {p.query_768} or {p.query_1024})"
        )
    query = jnp.broadcast_to(query[None], (b, seq, hidden)).astype(tokens.dtype)
    x = jnp.concatenate([tokens, query], axis=1)  # [B, 2S, H]
    total = 2 * seq

    mask = ocr2_attention_mask(seq)[None, None]
    cos_t, sin_t = build_rope_tables(total, p.head_dim, p.rope_theta)
    cos = cos_t[None, None]
    sin = sin_t[None, None]
    NH, NKV, D = p.num_heads, p.num_kv_heads, p.head_dim
    scale = 1.0 / (D**0.5)

    def body(x, layer):
        normed = rms_norm(x, layer["input_layernorm"], p.rms_norm_eps)
        q = _proj(normed, layer["q_proj"], layer["q_bias"]).reshape(
            b, total, NH, D
        ).transpose(0, 2, 1, 3)
        k = _proj(normed, layer["k_proj"], layer["k_bias"]).reshape(
            b, total, NKV, D
        ).transpose(0, 2, 1, 3)
        v = _proj(normed, layer["v_proj"], layer["v_bias"]).reshape(
            b, total, NKV, D
        ).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = attention(q, k, v, mask, scale)
        x = (x.astype(jnp.float32) + _proj(attn, layer["o_proj"]).astype(jnp.float32)).astype(x.dtype)
        normed = rms_norm(x, layer["post_attention_layernorm"], p.rms_norm_eps)
        gate = _proj(normed, layer["gate_proj"]).astype(jnp.float32)
        up = _proj(normed, layer["up_proj"]).astype(jnp.float32)
        mlp = _proj((jax.nn.silu(gate) * up).astype(x.dtype), layer["down_proj"])
        x = (x.astype(jnp.float32) + mlp.astype(jnp.float32)).astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["norm"], p.rms_norm_eps)
    refined = x[:, seq:]  # query half
    return _proj(refined, params["projector"]["w"], params["projector"]["b"])
