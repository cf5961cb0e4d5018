"""Ernie decoder with 3-axis M-RoPE.

Structure mirrors infer-paddleocr/src/transformer/: RMSNorm → GQA
attention with multimodal rotary (per-axis cos/sin tables sliced by
doubled mrope sections — attention.rs:185-238) → residual → RMSNorm →
SwiGLU MLP → residual; final norm; lm_head.

TPU-first: per-layer weights are stacked [L, ...] and the layer loop is a
`lax.scan` (one compiled block body instead of L inlined copies); the KV
cache is the static-shape runtime cache; prefill writes all positions at
once and decode steps write one.
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
from .config import PaddleConfig


# -- parameters -----------------------------------------------------------------


def init_ernie_params(
    cfg: PaddleConfig, key: jax.Array, dtype=jnp.bfloat16, host: bool = False
) -> Dict:
    """Random-init decoder tree. host=True builds f32 numpy arrays
    (runtime quantization consumes host numpy; the engine casts during
    the one-shot device upload — see the deepseek counterpart)."""
    H = cfg.hidden_size
    D = cfg.head_dim
    NH = cfg.num_attention_heads
    NKV = cfg.resolved_num_key_value_heads
    I = cfg.intermediate_size
    L = cfg.num_hidden_layers
    V = cfg.vocab_size

    if host:
        rng = np.random.default_rng(int(np.asarray(key).ravel()[-1]))
        pool = rng.standard_normal(1 << 20, dtype=np.float32)

        def normal(shape):
            n = int(np.prod(shape, dtype=np.int64))
            reps = -(-n // pool.size)
            return np.tile(pool, reps)[:n].reshape(shape)

        def ones(shape):
            return np.ones(shape, np.float32)

        def cast(x):
            return np.asarray(x, np.float32)
    else:
        keys = iter(jax.random.split(key, 10))

        def normal(shape):
            return jax.random.normal(next(keys), shape)

        def ones(shape):
            return jnp.ones(shape, dtype)

        def cast(x):
            return x.astype(dtype)

    def stack(shape, scale):
        return cast(normal((L, *shape)) * scale)

    params = {
        "embed_tokens": cast(normal((V, H)) * 0.02),
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
        "norm": ones((H,)),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = cast(normal((H, V)) * 0.02)
    return params


def fuse_ernie_params(params: Dict) -> Dict:
    """Concat column-independent projections along their output dims
    (q/k/v → qkv_proj, gate/up → gateup_proj) — bit-identical math,
    halves the decode projection count (see deepseek fuse_decoder_params)."""

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
    grp = fuse(grp, ("gate_proj", "up_proj"), "gateup_proj")
    out["layers"] = grp
    return out


def new_cache(cfg: PaddleConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_kv_cache(
        cfg.num_hidden_layers,
        batch,
        cfg.resolved_num_key_value_heads,
        max_len,
        cfg.head_dim,
        cfg.head_dim,
        dtype,
    )


# -- M-RoPE ---------------------------------------------------------------------


def mrope_cos_sin(
    position_ids: jnp.ndarray,  # [3, B, S] int32
    cfg: PaddleConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis rotary tables sliced by mrope sections → [B, S, head_dim]
    f32 (ref rope.rs:84-116 + attention.rs select_sections:220-238)."""
    D = cfg.head_dim
    half = D // 2
    inv_freq = 1.0 / (
        jnp.float32(cfg.rope_theta)
        ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [3,B,S,half]
    full = jnp.concatenate([angles, angles], axis=-1)  # [3,B,S,D]
    cos3, sin3 = jnp.cos(full), jnp.sin(full)

    sections = cfg.doubled_sections
    offs = np.cumsum([0, *sections])

    def select(t3):
        parts = [
            t3[axis % 3, ..., offs[axis] : offs[axis + 1]]
            for axis in range(len(sections))
        ]
        return jnp.concatenate(parts, axis=-1)  # [B, S, D]

    return select(cos3), select(sin3)


def _apply_mrope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    # x: [B, H, S, D], cos/sin: [B, S, D]
    x32 = x.astype(jnp.float32)
    c = cos[:, None]
    s = sin[:, None]
    return (x32 * c + rotate_half(x32) * s).astype(x.dtype)


# -- forward ---------------------------------------------------------------------


def ernie_forward(
    params: Dict,
    cfg: PaddleConfig,
    embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    cache: KVCache,
    *,
    mesh=None,
    **kw,
) -> Tuple[jnp.ndarray, KVCache]:
    """Ernie decoder pass; `mesh` activates row-sharded quant matmuls
    (ops/linear.quant_partition) for quantized serving under a dp mesh."""
    from ...ops.linear import quant_partition

    with quant_partition(mesh, "dp"):
        return _ernie_forward_body(
            params, cfg, embeds, position_ids, cache, **kw
        )


def _ernie_forward_body(
    params: Dict,
    cfg: PaddleConfig,
    embeds: jnp.ndarray,  # [B, S, H]
    position_ids: jnp.ndarray,  # [3, B, S] int32
    cache: KVCache,
    *,
    full_logits: bool = False,
    last_index: Optional[jnp.ndarray] = None,  # [B] int32: index of last real token
    pad_start: Optional[jnp.ndarray] = None,  # [B] int32 left-pad boundary
    row_lengths: Optional[jnp.ndarray] = None,  # [B] int32 per-row KV lengths
    flash_prefill: bool = False,  # S>1 steps attend via the Pallas kernel
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the decoder over S positions starting at cache.length.

    Returns (logits, cache): logits [B, V] at `last_index` (default S-1)
    in f32, or [B, S, V] when full_logits. The caller bumps cache.length.
    """
    B, S, H = embeds.shape
    NH = cfg.num_attention_heads
    NKV = cfg.resolved_num_key_value_heads
    D = cfg.head_dim
    S_max = cache.max_len
    start = cache.length

    cos, sin = mrope_cos_sin(position_ids, cfg)
    if row_lengths is not None:
        # Slot mode (continuous batching): row r's tokens live at
        # [0, row_lengths[r]) of its own cache row; the new token is
        # written at row_lengths[r] and may attend to [0, row_lengths[r]].
        if S != 1:
            raise ValueError("row_lengths decode supports single-token steps")
        _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
        mask = _kv_pos[None, None, None, :] <= row_lengths[:, None, None, None]
    else:
        mask = causal_mask(S, S_max, start)[None, None]  # [1,1,S,S_max]
        if pad_start is not None:
            # left-padded batching: row r ignores kv positions < pad_start[r]
            _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
            mask = mask & (
                _kv_pos[None, None, None, :] >= pad_start[:, None, None, None]
            )
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
            qkv = _proj(normed, layer["qkv_proj"])
            q, k, v = jnp.split(qkv, [NH * D, NH * D + NKV * D], axis=-1)
        else:
            q = _proj(normed, layer["q_proj"])
            k = _proj(normed, layer["k_proj"])
            v = _proj(normed, layer["v_proj"])
        q = q.reshape(B, S, NH, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, NKV, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, NKV, D).transpose(0, 2, 1, 3)
        q = _apply_mrope(q, cos, sin)
        k = _apply_mrope(k, cos, sin)

        # in-place carry updates (no per-step cache copies)
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
                # ops/pallas/prefill_attention.py): only the prompt's own K/V
                # matter — the [B,H,S,S_max] f32 score tensor never exists.
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
        x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)

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
        head = params["embed_tokens"].T  # tied
    if full_logits:
        if isinstance(head, dict):  # packed-quant lm_head
            return _proj(x.astype(jnp.float32), head).astype(jnp.float32), cache
        logits = jnp.einsum(
            "bsh,hv->bsv", x, head, preferred_element_type=jnp.float32
        )
        return logits.astype(jnp.float32), cache
    if last_index is None:
        x_last = x[:, -1]
    else:
        x_last = jnp.take_along_axis(x, last_index[:, None, None], axis=1)[:, 0]
    logits = _head_logits(x_last, head)
    return logits, cache


def _head_logits(x_last, head):
    """[B, H] @ lm_head → [B, V] f32 (packed-quant or float head)."""
    if isinstance(head, dict):
        return _proj(x_last.astype(jnp.float32), head).astype(jnp.float32)
    return jnp.einsum(
        "bh,hv->bv", x_last, head, preferred_element_type=jnp.float32
    ).astype(jnp.float32)


# polymorphic float/packed-quant projection (shared across families)
from ...ops.linear import project as _proj  # noqa: E402


# -- host-side position ids (M-RoPE) ---------------------------------------------


def compute_position_ids(
    cfg: PaddleConfig,
    input_ids: np.ndarray,  # [S] int64 host tokens (one row)
    image_grids,  # list of (t, h, w) grids in placeholder order
) -> Tuple[np.ndarray, int]:
    """3-axis positions for one row: text spans advance all axes together,
    image spans get (t, h, w) grid offsets from the span base. Returns
    ([3, S] int32, delta) with delta = max_pos + 1 - S
    (ref model.rs:568-666,695-760)."""
    merge = cfg.vision_config.spatial_merge_size
    image_token_id = cfg.image_token_id
    S = len(input_ids)
    if not image_grids:
        pos = np.arange(S, dtype=np.int32)
        return np.stack([pos, pos, pos]), 0

    axis_t, axis_h, axis_w = [], [], []
    st = 0
    next_scalar = 0
    grid_iter = iter(image_grids)
    ids = list(input_ids)
    while st < S:
        try:
            offset = ids[st:].index(image_token_id)
        except ValueError:
            offset = None
        if offset is None:
            for i in range(S - st):
                v = next_scalar + i
                axis_t.append(v), axis_h.append(v), axis_w.append(v)
            st = S
            break
        ed = st + offset
        for i in range(ed - st):
            v = next_scalar + i
            axis_t.append(v), axis_h.append(v), axis_w.append(v)
        next_scalar += ed - st
        t, h, w = next(grid_iter)
        llm_h, llm_w = h // merge, w // merge
        block = t * llm_h * llm_w
        assert all(tok == image_token_id for tok in ids[ed : ed + block]), (
            "non-image token inside placeholder span"
        )
        for _ in range(t):
            for row in range(llm_h):
                for col in range(llm_w):
                    axis_t.append(next_scalar)
                    axis_h.append(next_scalar + row)
                    axis_w.append(next_scalar + col)
        next_scalar += block
        st = ed + block
    max_val = max(max(axis_t), max(axis_h), max(axis_w))
    delta = max_val + 1 - S
    return (
        np.stack(
            [
                np.asarray(axis_t, np.int32),
                np.asarray(axis_h, np.int32),
                np.asarray(axis_w, np.int32),
            ]
        ),
        int(delta),
    )
