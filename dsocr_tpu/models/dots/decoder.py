"""Qwen2 language decoder (DotsOCR text stack).

Standard GQA decoder with full-dim RoPE and Qwen2's q/k/v biases
(ref infer-dots/src/transformer/). Same TPU structure as the other
families: stacked layer weights, lax.scan with the KV cache in the
carry.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import attention, causal_mask, rms_norm
from ...ops.pallas.prefill_attention import flash_prefill_attention_auto
from ...ops.rope import apply_rope, build_rope_tables
from ...runtime.kv_cache import KVCache, init_kv_cache
from .config import DotsTextConfig


def init_qwen2_params(cfg: DotsTextConfig, key: jax.Array, dtype=jnp.bfloat16) -> Dict:
    keys = iter(jax.random.split(key, 12))
    H, D = cfg.hidden_size, cfg.head_dim
    NH, NKV = cfg.num_attention_heads, cfg.num_key_value_heads
    I, L, V = cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size

    def stack(k, shape, scale):
        return (jax.random.normal(k, (L, *shape)) * scale).astype(dtype)

    params = {
        "embed_tokens": (jax.random.normal(next(keys), (V, H)) * 0.02).astype(dtype),
        "norm": jnp.ones((H,), dtype),
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "q_proj": stack(next(keys), (H, NH * D), H**-0.5),
            "k_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "v_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "o_proj": stack(next(keys), (NH * D, H), (NH * D) ** -0.5),
            "gate_proj": stack(next(keys), (H, I), H**-0.5),
            "up_proj": stack(next(keys), (H, I), H**-0.5),
            "down_proj": stack(next(keys), (I, H), I**-0.5),
        },
    }
    if cfg.attention_bias:
        params["layers"]["q_bias"] = jnp.zeros((L, NH * D), dtype)
        params["layers"]["k_bias"] = jnp.zeros((L, NKV * D), dtype)
        params["layers"]["v_bias"] = jnp.zeros((L, NKV * D), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (jax.random.normal(next(keys), (H, V)) * 0.02).astype(dtype)
    return params


def new_cache(cfg: DotsTextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_kv_cache(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len,
        cfg.head_dim, cfg.head_dim, dtype,
    )


def build_qwen2_rope(cfg: DotsTextConfig, max_len: int):
    return build_rope_tables(max_len, cfg.head_dim, cfg.rope_theta)


def _proj(x, w, b=None):
    out = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def qwen2_forward(
    params: Dict,
    cfg: DotsTextConfig,
    embeds: jnp.ndarray,  # [B, S, H]
    positions: jnp.ndarray,  # [B, S] int32
    cache: KVCache,
    rope_tables,
    *,
    full_logits: bool = False,
    last_index: Optional[jnp.ndarray] = None,
    pad_start: Optional[jnp.ndarray] = None,  # [B] int32 left-pad boundary
    row_lengths: Optional[jnp.ndarray] = None,  # [B] int32 per-row KV lengths
    flash_prefill: bool = False,  # S>1 steps attend via the Pallas kernel
) -> Tuple[jnp.ndarray, KVCache]:
    B, S, H = embeds.shape
    NH, NKV, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    S_max = cache.max_len
    start = cache.length
    cos_t, sin_t = rope_tables
    cos = cos_t[positions][:, None]
    sin = sin_t[positions][:, None]
    if row_lengths is not None:
        # Slot mode (continuous batching): row r's tokens live at
        # [0, row_lengths[r]); the new token is written at row_lengths[r].
        if S != 1:
            raise ValueError("row_lengths decode supports single-token steps")
        _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
        mask = _kv_pos[None, None, None, :] <= row_lengths[:, None, None, None]
    else:
        mask = causal_mask(S, S_max, start)[None, None]
        if pad_start is not None:
            # left-padded batching: row r ignores kv positions < pad_start[r]
            _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
            mask = mask & (_kv_pos[None, None, None, :] >= pad_start[:, None, None, None])
    scale = 1.0 / (D**0.5)
    lp = params["layers"]
    has_bias = "q_bias" in lp
    zero = jnp.int32(0)

    def body(carry, xs):
        x, k_all, v_all = carry
        layer, li = xs
        normed = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        q = _proj(normed, layer["q_proj"], layer.get("q_bias")).reshape(
            B, S, NH, D
        ).transpose(0, 2, 1, 3)
        k = _proj(normed, layer["k_proj"], layer.get("k_bias")).reshape(
            B, S, NKV, D
        ).transpose(0, 2, 1, 3)
        v = _proj(normed, layer["v_proj"], layer.get("v_bias")).reshape(
            B, S, NKV, D
        ).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if row_lengths is not None:
            # per-row write positions → scatter (one [B,H,D] slab per layer)
            rows = jnp.arange(B)
            k_all = k_all.at[li, rows, :, row_lengths, :].set(
                k[:, :, 0, :].astype(k_all.dtype)
            )
            v_all = v_all.at[li, rows, :, row_lengths, :].set(
                v[:, :, 0, :].astype(v_all.dtype)
            )
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None].astype(k_all.dtype), (li, zero, zero, start, zero)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None].astype(v_all.dtype), (li, zero, zero, start, zero)
            )
        if flash_prefill and S > 1:
            # prefill-from-empty-cache invariant (see
            # ops/pallas/prefill_attention.py): only the prompt's own
            # K/V matter — no [B,H,S,S_max] f32 scores in HBM.
            attn = flash_prefill_attention_auto(
                q, k.astype(q.dtype), v.astype(q.dtype), pad_start, scale=scale
            )
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            attn = attention(q, k_layer.astype(q.dtype), v_layer.astype(q.dtype), mask, scale)
        x = (x.astype(jnp.float32) + _proj(attn, layer["o_proj"]).astype(jnp.float32)).astype(x.dtype)

        normed = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        gate = _proj(normed, layer["gate_proj"]).astype(jnp.float32)
        up = _proj(normed, layer["up_proj"]).astype(jnp.float32)
        mlp = _proj((jax.nn.silu(gate) * up).astype(x.dtype), layer["down_proj"])
        x = (x.astype(jnp.float32) + mlp.astype(jnp.float32)).astype(x.dtype)
        return (x, k_all, v_all), None

    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    (x, new_k, new_v), _ = jax.lax.scan(body, (embeds, cache.k, cache.v), (lp, idx))
    cache = KVCache(k=new_k, v=new_v, length=cache.length)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed_tokens"].T
    if full_logits:
        return (
            jnp.einsum("bsh,hv->bsv", x, head, preferred_element_type=jnp.float32)
            .astype(jnp.float32),
            cache,
        )
    if last_index is None:
        x_last = x[:, -1]
    else:
        x_last = jnp.take_along_axis(x, last_index[:, None, None], axis=1)[:, 0]
    logits = jnp.einsum("bh,hv->bv", x_last, head, preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), cache
