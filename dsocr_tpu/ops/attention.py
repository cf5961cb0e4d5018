"""Scaled dot-product attention with GQA and static-cache masking.

Numerics follow the reference's hardened path (block.rs:662-775): score
matmul and softmax in f32 when the working dtype is low precision, value
accumulation in f32. On TPU this is one fused einsum→softmax→einsum; XLA
handles the fusion, and the static KV buffer + length mask replaces the
reference's concat-of-chunks cache views.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def repeat_kv(x: jnp.ndarray, repeats: int) -> jnp.ndarray:
    """[B, H_kv, S, D] → [B, H_kv*repeats, S, D] (GQA head expansion)."""
    if repeats == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, repeats, s, d)).reshape(
        b, h * repeats, s, d
    )


def causal_mask(q_len: int, kv_len: int, q_offset) -> jnp.ndarray:
    """[q_len, kv_len] bool mask: True where query position (q_offset + i)
    may attend to kv position j (j <= q_offset + i). `q_offset` may be a
    traced scalar (the current cache length during decode)."""
    q_pos = jnp.arange(q_len, dtype=jnp.int32)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
    return kv_pos <= q_pos


def attention(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H_kv, Skv, D]
    v: jnp.ndarray,  # [B, H_kv, Skv, Dv]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Sq, Skv], bool
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns [B, Sq, H*Dv]. Scores/softmax in f32; output in q.dtype."""
    dtype = q.dtype
    num_heads = q.shape[1]
    num_kv_heads = k.shape[1]
    if num_kv_heads != num_heads:
        assert num_heads % num_kv_heads == 0
        k = repeat_kv(k, num_heads // num_kv_heads)
        v = repeat_kv(v, num_heads // num_kv_heads)

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    b, h, sq, dv = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, sq, h * dv).astype(dtype)


# -- int8-quantized KV cache (decode-time HBM bandwidth) -------------------------
#
# The slot decode step streams the whole static KV buffer every token;
# storing K/V as int8 codes with one f32 scale per (head, token) halves
# that traffic vs bf16. The dequant never materializes: per-token scales
# commute out of both dots — (q @ (c·s)ᵀ) == (q @ cᵀ)·s and
# (p @ (c·s)) == (p·s) @ c — so the kernel reads int8 from HBM and
# applies scales to the [B, H, 1, S]-shaped score/weight vectors.
# (No reference analogue: candle caches are model-dtype, cache.rs:15.)


def quantize_kv_int8(x: jnp.ndarray):
    """[..., S, D] → (codes int8, scale f32 [..., S]): symmetric per-token
    per-head max-abs scaling (int8 values are exact in bf16, so the
    score-side dequant loses nothing vs dequantize-then-dot)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    codes = jnp.round(x.astype(jnp.float32) / safe[..., None])
    codes = jnp.clip(codes, -127, 127).astype(jnp.int8)
    return codes, scale


def attention_kv_int8(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k_codes: jnp.ndarray,  # [B, H_kv, Skv, D] int8
    k_scale: jnp.ndarray,  # [B, H_kv, Skv] f32
    v_codes: jnp.ndarray,  # [B, H_kv, Skv, Dv] int8
    v_scale: jnp.ndarray,  # [B, H_kv, Skv] f32
    mask: Optional[jnp.ndarray] = None,  # [B, 1, Sq|1, Skv] (head-broadcast)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """attention() over an int8-quantized KV cache. GQA runs as grouped
    einsums over the codes — the head repeat never materializes (the
    whole point is reading fewer KV bytes). The mask must be
    head-broadcastable (all decoders build [B, 1, 1, S_max] slot masks)."""
    dtype = q.dtype
    B, NH, Sq, D = q.shape
    NKV, Skv = k_codes.shape[1], k_codes.shape[2]
    assert NH % NKV == 0
    G = NH // NKV  # q heads k*G..(k+1)*G share kv head k (repeat_kv order)
    if scale is None:
        scale = 1.0 / (D**0.5)
    qg = q.reshape(B, NKV, G, Sq, D)
    scores = jnp.einsum(
        "bkgqd,bksd->bkgqs", qg, k_codes.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (k_scale[:, :, None, None, :] * jnp.float32(scale))
    if mask is not None:
        assert mask.ndim == 4 and mask.shape[1] == 1, "mask must be head-broadcastable"
        scores = jnp.where(mask[:, :, None], scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bkgqs,bksd->bkgqd",
        weights * v_scale[:, :, None, None, :],
        v_codes.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dv = out.shape[-1]
    out = out.reshape(B, NH, Sq, dv)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, NH * dv).astype(dtype)


def _slot_kernel_dispatch(q, k_all, v_all, ks_all, vs_all, li, row_lengths,
                          scale, mesh, cache_replicated=False):
    """Route to the fused slot kernel: direct when single-device,
    shard_map per-shard under a mesh. Returns None when the mesh layout
    can't be expressed (caller falls back to the einsum path)."""
    from .pallas.slot_attention import (
        slot_decode_attention_auto,
        slot_decode_attention_mesh,
    )

    if mesh is None:
        return slot_decode_attention_auto(
            q, k_all, v_all, ks_all, vs_all, li, row_lengths, scale=scale
        )
    return slot_decode_attention_mesh(
        q, k_all, v_all, ks_all, vs_all, li, row_lengths, scale=scale,
        mesh=mesh, cache_replicated=cache_replicated,
    )


def _slot_update_dispatch(k_all, v_all, ks_all, vs_all, k_new, v_new,
                          ks_new, vs_new, li, row_lengths, mesh,
                          cache_replicated, use_kernel):
    """Write one new token per row into the slot caches at
    row_lengths[r]. On TPU the write runs as an ALIASED Pallas call
    (slot_kv_update): the XLA scatter stops being in-place as soon as a
    Pallas attend consumes the cache in the same scan body — XLA then
    copies every full [L, B, H, S, *] stack per layer (measured 71 vs
    14 ms/step at 16 rows); the aliased kernel touches one 128-token
    window per row instead. Falls back to the scatter when the kernel
    is off or the mesh layout can't be expressed."""
    if use_kernel:
        from .pallas.slot_attention import (
            slot_kv_update_auto,
            slot_kv_update_mesh,
        )

        if mesh is None:
            return slot_kv_update_auto(
                k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new, vs_new,
                li, row_lengths,
            )
        out = slot_kv_update_mesh(
            k_all, v_all, ks_all, vs_all, k_new, v_new, ks_new, vs_new,
            li, row_lengths, mesh=mesh, cache_replicated=cache_replicated,
        )
        if out is not None:
            return out
    rows = jnp.arange(k_new.shape[0])
    k_all = k_all.at[li, rows, :, row_lengths, :].set(k_new)
    v_all = v_all.at[li, rows, :, row_lengths, :].set(v_new)
    if ks_all is not None:
        ks_all = ks_all.at[li, rows, :, row_lengths].set(ks_new)
        vs_all = vs_all.at[li, rows, :, row_lengths].set(vs_new)
    return k_all, v_all, ks_all, vs_all


def slot_kv_write_attend(
    q: jnp.ndarray,  # [B, NH, 1, D]
    k: jnp.ndarray,  # [B, H_kv, 1, D] new token K (pre-quant dtype)
    v: jnp.ndarray,  # [B, H_kv, 1, Dv]
    k_all: jnp.ndarray,  # [L, B, H_kv, S_max, D] carry (dtype or int8 codes)
    v_all: jnp.ndarray,
    ks_all: Optional[jnp.ndarray],  # [L, B, H_kv, S_max] f32 scales or None
    vs_all: Optional[jnp.ndarray],
    li: jnp.ndarray,  # scalar int32 layer index (scan)
    row_lengths: jnp.ndarray,  # [B] int32 per-row write positions
    mask: Optional[jnp.ndarray],
    scale: Optional[float],
    mesh=None,  # sharded slot decode runs the kernel via shard_map
    cache_replicated: bool = False,  # mesh layout: replicated KV (EP-quant)
):
    """Slot-mode (single-token) KV write + attend, shared by every
    family's scanned decoder: writes row r's new K/V at row_lengths[r]
    of layer li, then attends over that layer's cache. With ks_all/vs_all
    present the carries hold int8 codes + per-token scales (half the
    decode-step KV streaming); otherwise model dtype.
    Returns (attn [B, 1, NH*Dv], k_all, v_all, ks_all, vs_all)."""
    import os

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    # The Pallas slot kernel walks only [0, lengths[r]] of each row and
    # dequantizes int8 codes in VMEM (ops/pallas/slot_attention.py); the
    # XLA einsum path streams the full S_max row. The slot mask is
    # exactly `kv_pos <= row_lengths`, which the kernel derives from
    # row_lengths itself. Under a mesh the kernel runs per-shard via
    # shard_map (pass mesh=None for replicated cache layouts, e.g.
    # EP-quantized serving). DSOCR_SLOT_ATTN_KERNEL: "0" forces the
    # einsum path, "1" forces the kernel (interpreted off-TPU);
    # default = TPU only.
    flag = os.environ.get("DSOCR_SLOT_ATTN_KERNEL", "")
    use_kernel = flag == "1" or (flag != "0" and jax.default_backend() == "tpu")
    if ks_all is not None:
        k_q, k_s = quantize_kv_int8(k)
        v_q, v_s = quantize_kv_int8(v)
        k_all, v_all, ks_all, vs_all = _slot_update_dispatch(
            k_all, v_all, ks_all, vs_all,
            k_q[:, :, 0, :], v_q[:, :, 0, :], k_s[:, :, 0], v_s[:, :, 0],
            li, row_lengths, mesh, cache_replicated, use_kernel,
        )
        if use_kernel:
            attn = _slot_kernel_dispatch(
                q, k_all, v_all, ks_all, vs_all, li, row_lengths, scale,
                mesh, cache_replicated,
            )
            if attn is not None:
                return attn, k_all, v_all, ks_all, vs_all
        attn = attention_kv_int8(
            q,
            jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(ks_all, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(vs_all, li, 0, keepdims=False),
            mask,
            scale,
        )
        return attn, k_all, v_all, ks_all, vs_all
    k_all, v_all, _, _ = _slot_update_dispatch(
        k_all, v_all, None, None,
        k[:, :, 0, :].astype(k_all.dtype), v[:, :, 0, :].astype(v_all.dtype),
        None, None, li, row_lengths, mesh, cache_replicated, use_kernel,
    )
    if use_kernel:
        attn = _slot_kernel_dispatch(
            q, k_all, v_all, None, None, li, row_lengths, scale,
            mesh, cache_replicated,
        )
        if attn is not None:
            return attn, k_all, v_all, ks_all, vs_all
    k_layer = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
    v_layer = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
    attn = attention(q, k_layer.astype(q.dtype), v_layer.astype(q.dtype), mask, scale)
    return attn, k_all, v_all, ks_all, vs_all
