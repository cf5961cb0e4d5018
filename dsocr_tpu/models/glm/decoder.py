"""GLM text decoder.

Mirrors infer-glm/src/transformer/: sandwich norms (input_layernorm →
attention → post_self_attn_layernorm(attn) → residual →
post_attention_layernorm → fused gate_up SwiGLU → post_mlp_layernorm(mlp)
→ residual), partial interleaved M-RoPE (rope_dim = head_dim ·
partial_rotary_factor; sections over the half dim pick axes t/h/w; cos
entries duplicated pairwise before a rotate_half application on the rope
prefix — attention.rs:284-338, rope.rs).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import attention, causal_mask, rms_norm, rotate_half
from ...ops.attention import slot_kv_write_attend
from ...ops.pallas.prefill_attention import flash_prefill_attention_auto
from ...runtime.kv_cache import KVCache, init_kv_cache
from .config import GlmTextConfig


def init_glm_text_params(cfg: GlmTextConfig, key: jax.Array, dtype=jnp.bfloat16) -> Dict:
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
            "post_self_attn_layernorm": jnp.ones((L, H), dtype),
            "post_mlp_layernorm": jnp.ones((L, H), dtype),
            "q_proj": stack(next(keys), (H, NH * D), H**-0.5),
            "k_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "v_proj": stack(next(keys), (H, NKV * D), H**-0.5),
            "o_proj": stack(next(keys), (NH * D, H), (NH * D) ** -0.5),
            "gate_up_proj": stack(next(keys), (H, 2 * I), H**-0.5),
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


def new_cache(cfg: GlmTextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_kv_cache(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len,
        cfg.head_dim, cfg.head_dim, dtype,
    )


def glm_mrope_cos_sin(
    position_ids: jnp.ndarray,  # [3, B, S] int32
    cfg: GlmTextConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [B, S, rope_dim] with section-selected axes and pairwise
    interleave duplication (rope.rs cos_sin + expand_interleaved)."""
    rope_dim = cfg.rope_dim
    half = rope_dim // 2
    inv_freq = 1.0 / (
        jnp.float32(cfg.rope_theta)
        ** ((2 * jnp.arange(half, dtype=jnp.float32)) / rope_dim)
    )
    # section-select which axis drives each frequency slot
    sections = cfg.mrope_section
    assert sum(sections) == half, (
        f"mrope sections {sections} must sum to rope half dim {half}"
    )
    axis_of_slot = np.concatenate(
        [np.full(width, idx % 3, np.int32) for idx, width in enumerate(sections)]
    )
    pos = position_ids.astype(jnp.float32)  # [3, B, S]
    pos_per_slot = pos[jnp.asarray(axis_of_slot)]  # [half, B, S]
    freqs = jnp.moveaxis(pos_per_slot, 0, -1) * inv_freq  # [B, S, half]
    # pairwise interleave: [f0, f0, f1, f1, ...]
    interleaved = jnp.repeat(freqs, 2, axis=-1)  # [B, S, rope_dim]
    return jnp.cos(interleaved), jnp.sin(interleaved)


def _apply_partial_rope(x, cos, sin, rope_dim):
    # x [B, H, S, D]; cos/sin [B, S, rope_dim]
    x32 = x.astype(jnp.float32)
    rot = x32[..., :rope_dim]
    rot = rot * cos[:, None] + rotate_half(rot) * sin[:, None]
    return jnp.concatenate([rot, x32[..., rope_dim:]], axis=-1).astype(x.dtype)


def _proj(x, w, b=None):
    out = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def glm_forward(
    params: Dict,
    cfg: GlmTextConfig,
    embeds: jnp.ndarray,  # [B, S, H]
    position_ids: jnp.ndarray,  # [3, B, S] int32
    cache: KVCache,
    *,
    full_logits: bool = False,
    last_index: Optional[jnp.ndarray] = None,
    pad_start: Optional[jnp.ndarray] = None,  # [B] int32 left-pad boundary
    row_lengths: Optional[jnp.ndarray] = None,  # [B] int32 per-row KV lengths
    flash_prefill: bool = False,  # S>1 steps attend via the Pallas kernel
) -> Tuple[jnp.ndarray, KVCache]:
    B, S, H = embeds.shape
    NH, NKV, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rope_dim = cfg.rope_dim
    S_max = cache.max_len
    start = cache.length
    I = cfg.intermediate_size

    cos, sin = glm_mrope_cos_sin(position_ids, cfg)
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
            mask = mask & (
                _kv_pos[None, None, None, :] >= pad_start[:, None, None, None]
            )
    scale = 1.0 / (D**0.5)
    lp = params["layers"]
    zero = jnp.int32(0)

    def body(carry, xs):
        x, k_all, v_all, ks_all, vs_all = carry
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
        q = _apply_partial_rope(q, cos, sin, rope_dim)
        k = _apply_partial_rope(k, cos, sin, rope_dim)
        if row_lengths is not None:
            # per-row write positions → scatter + attend (int8 codes +
            # scales when the cache is quantized; shared across families)
            attn, k_all, v_all, ks_all, vs_all = slot_kv_write_attend(
                q, k, v, k_all, v_all, ks_all, vs_all, li, row_lengths,
                mask, scale,
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
                attn = attention(
                    q, k_layer.astype(q.dtype), v_layer.astype(q.dtype), mask, scale
                )
        attn = _proj(attn, layer["o_proj"])
        attn = rms_norm(attn, layer["post_self_attn_layernorm"], cfg.rms_norm_eps)
        x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)

        normed = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        gate_up = _proj(normed, layer["gate_up_proj"]).astype(jnp.float32)
        gate, up = gate_up[..., :I], gate_up[..., I:]
        mlp = _proj((jax.nn.silu(gate) * up).astype(x.dtype), layer["down_proj"])
        mlp = rms_norm(mlp, layer["post_mlp_layernorm"], cfg.rms_norm_eps)
        x = (x.astype(jnp.float32) + mlp.astype(jnp.float32)).astype(x.dtype)
        return (x, k_all, v_all, ks_all, vs_all), None

    if cache.k_scale is not None and row_lengths is None:
        raise ValueError("int8 KV cache supports slot decode steps only")
    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    carry = (embeds, cache.k, cache.v, cache.k_scale, cache.v_scale)
    (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(body, carry, (lp, idx))
    cache = KVCache(
        k=new_k, v=new_v, length=cache.length, k_scale=new_ks, v_scale=new_vs
    )

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


def compute_glm_position_ids(
    cfg_image_token_id: int,
    video_start_id: int,
    video_end_id: int,
    input_ids: np.ndarray,
    image_grids,
    merge: int,
) -> Tuple[np.ndarray, int]:
    """Token-type grouped 3-axis positions (ref model.rs:165-260).
    Returns ([3, S] int32, next_position_base)."""
    ids = list(input_ids)
    types = []
    in_video = False
    for tok in ids:
        if tok == video_start_id:
            in_video = True
        elif tok == video_end_id:
            in_video = False
        if tok == cfg_image_token_id and not in_video:
            types.append("image")
        elif tok == cfg_image_token_id and in_video:
            types.append("video")
        else:
            types.append("text")

    t_axis, h_axis, w_axis = [], [], []
    max_position = -1
    image_index = 0
    start = 0
    while start < len(types):
        ty = types[start]
        end = start + 1
        while end < len(types) and types[end] == ty:
            end += 1
        st_idx = max_position + 1
        if ty == "image":
            t, h, w = image_grids[image_index]
            for t_idx in range(t):
                for h_idx in range(h // merge):
                    for w_idx in range(w // merge):
                        t_axis.append(st_idx + t_idx)
                        h_axis.append(st_idx + h_idx)
                        w_axis.append(st_idx + w_idx)
                        max_position = max(
                            max_position, st_idx + t_idx, st_idx + h_idx, st_idx + w_idx
                        )
            image_index += 1
        else:  # text (video handled as text-advance for parity scope)
            for offset in range(end - start):
                pos = st_idx + offset
                t_axis.append(pos)
                h_axis.append(pos)
                w_axis.append(pos)
                max_position = max(max_position, pos)
        start = end
    positions = np.stack(
        [
            np.asarray(t_axis, np.int32),
            np.asarray(h_axis, np.int32),
            np.asarray(w_axis, np.int32),
        ]
    )
    return positions, max_position + 1
