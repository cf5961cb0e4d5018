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
from ...ops.attention import slot_kv_write_attend
from ...ops.pallas.prefill_attention import flash_prefill_attention_auto
from ...ops.rope import apply_rope, build_rope_tables
from ...runtime.kv_cache import KVCache, init_kv_cache
from .config import DotsTextConfig


def init_qwen2_params(
    cfg: DotsTextConfig, key: jax.Array, dtype=jnp.bfloat16, host: bool = False
) -> Dict:
    """Random-init decoder tree. host=True builds f32 numpy arrays
    (runtime quantization consumes host numpy; the engine casts during
    the one-shot device upload — see the deepseek counterpart)."""
    import numpy as np

    H, D = cfg.hidden_size, cfg.head_dim
    NH, NKV = cfg.num_attention_heads, cfg.num_key_value_heads
    I, L, V = cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size

    if host:
        rng = np.random.default_rng(int(np.asarray(key).ravel()[-1]))
        pool = rng.standard_normal(1 << 20, dtype=np.float32)

        def normal(shape):
            n = int(np.prod(shape, dtype=np.int64))
            reps = -(-n // pool.size)
            return np.tile(pool, reps)[:n].reshape(shape)

        def ones(shape):
            return np.ones(shape, np.float32)

        def zeros(shape):
            return np.zeros(shape, np.float32)

        def cast(x):
            return np.asarray(x, np.float32)
    else:
        keys = iter(jax.random.split(key, 12))

        def normal(shape):
            return jax.random.normal(next(keys), shape)

        def ones(shape):
            return jnp.ones(shape, dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        def cast(x):
            return x.astype(dtype)

    def stack(shape, scale):
        return cast(normal((L, *shape)) * scale)

    params = {
        "embed_tokens": cast(normal((V, H)) * 0.02),
        "norm": ones((H,)),
        "layers": {
            "input_layernorm": ones((L, H)),
            "post_attention_layernorm": ones((L, H)),
            "q_proj": stack((H, NH * D), H**-0.5),
            "k_proj": stack((H, NKV * D), H**-0.5),
            "v_proj": stack((H, NKV * D), H**-0.5),
            "o_proj": stack((NH * D, H), (NH * D) ** -0.5),
            "gate_proj": stack((H, I), H**-0.5),
            "up_proj": stack((H, I), H**-0.5),
            "down_proj": stack((I, H), I**-0.5),
        },
    }
    if cfg.attention_bias:
        params["layers"]["q_bias"] = zeros((L, NH * D))
        params["layers"]["k_bias"] = zeros((L, NKV * D))
        params["layers"]["v_bias"] = zeros((L, NKV * D))
    if not cfg.tie_word_embeddings:
        params["lm_head"] = cast(normal((H, V)) * 0.02)
    return params


def fuse_qwen2_params(params: Dict) -> Dict:
    """Concat column-independent projections along their output dims
    (q/k/v → qkv_proj + qkv_bias, gate/up → gateup_proj) — bit-identical
    math, halves the decode projection count."""
    import numpy as np

    def fuse(group, keys, new_key):
        if all(k in group for k in keys):
            parts = [group.pop(k) for k in keys]
            cat = (
                np.concatenate
                if all(isinstance(p, np.ndarray) for p in parts)
                else jnp.concatenate
            )
            group[new_key] = cat(parts, axis=-1)
        return group

    out = dict(params)
    grp = dict(out["layers"])
    grp = fuse(grp, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
    grp = fuse(grp, ("q_bias", "k_bias", "v_bias"), "qkv_bias")
    grp = fuse(grp, ("gate_proj", "up_proj"), "gateup_proj")
    out["layers"] = grp
    return out


def new_cache(cfg: DotsTextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_kv_cache(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len,
        cfg.head_dim, cfg.head_dim, dtype,
    )


def build_qwen2_rope(cfg: DotsTextConfig, max_len: int):
    return build_rope_tables(max_len, cfg.head_dim, cfg.rope_theta)


# polymorphic float/packed-quant projection (shared across families)
from ...ops.linear import project as _proj  # noqa: E402


def qwen2_forward(
    params: Dict,
    cfg: DotsTextConfig,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    rope_tables,
    *,
    mesh=None,
    **kw,
) -> Tuple[jnp.ndarray, KVCache]:
    """Qwen2 decoder pass; `mesh` activates row-sharded quant matmuls
    (ops/linear.quant_partition) for quantized serving under a dp mesh."""
    from ...ops.linear import quant_partition

    with quant_partition(mesh, "dp"):
        return _qwen2_forward_body(
            params, cfg, embeds, positions, cache, rope_tables, **kw
        )


def _qwen2_forward_body(
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
    from ...ops.linear import split_quantized, with_quantized

    lq, lp = split_quantized(params["layers"])
    zero = jnp.int32(0)

    def body(carry, xs):
        x, k_all, v_all, ks_all, vs_all = carry
        layer_xs, li = xs
        layer = with_quantized(layer_xs, lq, li)
        normed = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if "qkv_proj" in layer:
            qkv = _proj(normed, layer["qkv_proj"], layer.get("qkv_bias"))
            q, k, v = jnp.split(qkv, [NH * D, NH * D + NKV * D], axis=-1)
        else:
            q = _proj(normed, layer["q_proj"], layer.get("q_bias"))
            k = _proj(normed, layer["k_proj"], layer.get("k_bias"))
            v = _proj(normed, layer["v_proj"], layer.get("v_bias"))
        q = q.reshape(B, S, NH, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, NKV, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, NKV, D).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
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
                attn = attention(q, k_layer.astype(q.dtype), v_layer.astype(q.dtype), mask, scale)
        x = (x.astype(jnp.float32) + _proj(attn, layer["o_proj"]).astype(jnp.float32)).astype(x.dtype)

        normed = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        if "gateup_proj" in layer:
            gu = _proj(normed, layer["gateup_proj"]).astype(jnp.float32)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _proj(normed, layer["gate_proj"]).astype(jnp.float32)
            up = _proj(normed, layer["up_proj"]).astype(jnp.float32)
        mlp = _proj((jax.nn.silu(gate) * up).astype(x.dtype), layer["down_proj"])
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
        if isinstance(head, dict):  # packed-quant lm_head
            return _proj(x.astype(jnp.float32), head).astype(jnp.float32), cache
        return (
            jnp.einsum("bsh,hv->bsv", x, head, preferred_element_type=jnp.float32)
            .astype(jnp.float32),
            cache,
        )
    if last_index is None:
        x_last = x[:, -1]
    else:
        x_last = jnp.take_along_axis(x, last_index[:, None, None], axis=1)[:, 0]
    if isinstance(head, dict):  # packed-quant lm_head
        return _proj(x_last.astype(jnp.float32), head).astype(jnp.float32), cache
    logits = jnp.einsum("bh,hv->bv", x_last, head, preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), cache
