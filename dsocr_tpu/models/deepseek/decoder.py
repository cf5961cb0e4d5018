"""DeepSeek-V2 MoE language decoder.

Mirrors infer-deepseek/src/transformer/: RMSNorm → MHA with optional
partial RoPE (rope on the first qk_rope_head_dim dims, MLA even/odd
interleave regroup when use_mla — block.rs:446-804,1403-1426) → residual
→ RMSNorm → dense SwiGLU (first_k_dense_replace layers) or DeepSeek-V2
MoE (f32 gating, greedy top-k, shared experts — block.rs:1215-1395) →
residual; final RMSNorm; f32 lm_head.

TPU-first: the dense prefix and the MoE suffix are each a `lax.scan`
over stacked layer weights; experts run as `ragged_dot` grouped matmuls
(ops.moe) instead of the reference's host-side token sort loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import attention, causal_mask, rms_norm
from ...ops.pallas.prefill_attention import flash_prefill_attention_auto
from ...ops.moe import (
    LayeredKQuant,
    LayeredQ8,
    MoeConfig,
    dequant_stack,
    moe_apply,
    moe_apply_fused,
    moe_apply_quant,
    moe_apply_quant_fused,
    moe_router,
    quant_method,
)
from ...ops.rope import apply_rope, build_rope_tables
from ...runtime.kv_cache import KVCache, init_kv_cache
from .config import DeepseekV2Config


def _split_layers(cfg: DeepseekV2Config) -> Tuple[int, int]:
    """(num_dense, num_moe); requires the standard dense-prefix pattern."""
    pattern = [cfg.is_moe_layer(i) for i in range(cfg.num_hidden_layers)]
    num_dense = 0
    for flag in pattern:
        if flag:
            break
        num_dense += 1
    if any(not f for f in pattern[num_dense:]):
        raise NotImplementedError(
            "non-contiguous MoE layer patterns not supported (moe_layer_freq != 1)"
        )
    return num_dense, cfg.num_hidden_layers - num_dense


def init_deepseek_params(
    cfg: DeepseekV2Config, key: jax.Array, dtype=jnp.bfloat16, host: bool = False
) -> Dict:
    """Random-init decoder tree. host=True builds numpy arrays instead of
    device arrays — runtime quantization consumes host numpy, and pulling
    a freshly device-initialized 3B tree back through the tunneled TPU
    link takes ~15 min (CLAUDE.md); the engine device_puts the quantized
    result once."""
    H = cfg.hidden_size
    D = cfg.head_dim
    NH = cfg.num_attention_heads
    NKV = cfg.resolved_kv_heads
    DV = cfg.resolved_v_head_dim
    V = cfg.vocab_size
    num_dense, num_moe = _split_layers(cfg)

    if host:
        # stays float32: ml_dtypes bf16 conversions are software-emulated
        # (minutes over a 3B tree); the engine casts to the serving dtype
        # during the one-shot device upload after quantization. Values
        # come from a tiled 1M-sample pool — generating ~3B fresh samples
        # took ~9 min on this host's single weak core, and random-init
        # benchmarking only needs realistic magnitudes, not independence.
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
        keys = iter(jax.random.split(key, 32))

        def normal(shape):
            return jax.random.normal(next(keys), shape)

        def ones(shape):
            return jnp.ones(shape, dtype)

        def cast(x):
            return x.astype(dtype)

    def stack(n, shape, scale):
        return cast(normal((n, *shape)) * scale)

    def attn_stack(n):
        return {
            "input_layernorm": ones((n, H)),
            "post_attention_layernorm": ones((n, H)),
            "q_proj": stack(n, (H, NH * D), H**-0.5),
            "k_proj": stack(n, (H, NKV * D), H**-0.5),
            "v_proj": stack(n, (H, NKV * DV), H**-0.5),
            "o_proj": stack(n, (NH * DV, H), (NH * DV) ** -0.5),
        }

    params: Dict = {
        "embed_tokens": cast(normal((V, H)) * 0.02),
        "norm": ones((H,)),
        "lm_head": cast(normal((H, V)) * 0.02),
    }
    if num_dense:
        I = cfg.intermediate_size
        params["dense_layers"] = {
            **attn_stack(num_dense),
            "gate_proj": stack(num_dense, (H, I), H**-0.5),
            "up_proj": stack(num_dense, (H, I), H**-0.5),
            "down_proj": stack(num_dense, (I, H), I**-0.5),
        }
    if num_moe:
        E = cfg.n_routed_experts
        MI = cfg.moe_intermediate_size or cfg.intermediate_size
        SI = MI * (cfg.n_shared_experts or 0)
        moe = {
            **attn_stack(num_moe),
            "gate_weight": stack(num_moe, (E, H), H**-0.5),
            "experts_gate": stack(num_moe, (E, H, MI), H**-0.5),
            "experts_up": stack(num_moe, (E, H, MI), H**-0.5),
            "experts_down": stack(num_moe, (E, MI, H), MI**-0.5),
        }
        if SI:
            moe["shared_gate"] = stack(num_moe, (H, SI), H**-0.5)
            moe["shared_up"] = stack(num_moe, (H, SI), H**-0.5)
            moe["shared_down"] = stack(num_moe, (SI, H), SI**-0.5)
        params["moe_layers"] = moe
    return params


def fuse_decoder_params(params: Dict) -> Dict:
    """Concat column-independent projections along their output dims:
    q/k/v → qkv_proj, gate/up → gateup_proj, shared gate/up →
    shared_gateup, expert gate/up stacks → experts_gateup.

    Decode on TPU is latency-bound on op count (dozens of tiny matmuls
    per token); halving the projection count is bit-identical math
    (each output column is computed independently). Applied at engine
    init on the single-chip path — the mesh path keeps split weights so
    TP shard boundaries align with the q/k/v splits."""

    def fuse(group, keys, new_key):
        if all(k in group for k in keys):
            parts = [group.pop(k) for k in keys]
            # np.concatenate for host trees (jnp would device_put —
            # host-init + quantize must stay off-device until packed)
            cat = (
                np.concatenate
                if all(isinstance(p, np.ndarray) for p in parts)
                else jnp.concatenate
            )
            group[new_key] = cat(parts, axis=-1)
        return group

    out = dict(params)
    for g in ("dense_layers", "moe_layers"):
        if g not in out:
            continue
        grp = dict(out[g])
        grp = fuse(grp, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
        grp = fuse(grp, ("gate_proj", "up_proj"), "gateup_proj")
        grp = fuse(grp, ("shared_gate", "shared_up"), "shared_gateup")
        grp = fuse(grp, ("experts_gate", "experts_up"), "experts_gateup")
        out[g] = grp
    return out


def new_cache(
    cfg: DeepseekV2Config, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    return init_kv_cache(
        cfg.num_hidden_layers,
        batch,
        cfg.resolved_kv_heads,
        max_len,
        cfg.head_dim,
        cfg.resolved_v_head_dim,
        dtype,
    )


# polymorphic float/packed-quant projection (shared across families)
from ...ops.linear import project as _proj  # noqa: E402


def _partial_rope(x: jnp.ndarray, cos, sin, rope_dim: int, use_mla: bool):
    """Rotate the first rope_dim dims; pass the tail through
    (ref block.rs:563-588)."""
    head_dim = x.shape[-1]
    if rope_dim >= head_dim:
        return apply_rope(x, cos, sin, interleaved=use_mla)
    rot = apply_rope(x[..., :rope_dim], cos, sin, interleaved=use_mla)
    return jnp.concatenate([rot, x[..., rope_dim:]], axis=-1)


def deepseek_forward(
    params: Dict,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, S, H]
    positions: jnp.ndarray,  # [B, S] int32 absolute positions
    cache: KVCache,
    rope_tables: Tuple[jnp.ndarray, jnp.ndarray],  # (cos, sin) [max_pos, rope_dim]
    *,
    full_logits: bool = False,
    last_index: Optional[jnp.ndarray] = None,  # [B] int32
    pad_start: Optional[jnp.ndarray] = None,  # [B] int32 left-pad boundary
    row_lengths: Optional[jnp.ndarray] = None,  # [B] int32 per-row KV lengths
    page_tables: Optional[jnp.ndarray] = None,  # [B, P_max] int32 — paged slot KV
    flash_prefill: bool = False,  # S>1 steps attend via the Pallas kernel
    mesh=None,  # shard the flash-prefill kernel over this mesh (shard_map)
) -> Tuple[jnp.ndarray, KVCache]:
    B, S, H = embeds.shape
    NH = cfg.num_attention_heads
    NKV = cfg.resolved_kv_heads
    D = cfg.head_dim
    DV = cfg.resolved_v_head_dim
    rope_dim = cfg.rope_dim
    S_max = cache.max_len
    start = cache.length
    num_dense, num_moe = _split_layers(cfg)

    cos_t, sin_t = rope_tables
    cos = cos_t[positions][:, None]  # [B, 1, S, rope_dim]
    sin = sin_t[positions][:, None]
    if page_tables is not None:
        # Paged slot mode: cache.k/v are page POOLS [L, P, H, page, D];
        # row r's tokens live in the pages page_tables[r] lists, the new
        # token is written at logical position row_lengths[r], and the
        # paged Pallas kernel walks only the used pages (masking happens
        # in-kernel; no [B, S_max] mask exists).
        if S != 1 or row_lengths is None:
            raise ValueError("paged decode supports single-token slot steps")
        mask = None
    elif row_lengths is not None:
        # Slot mode (continuous batching): row r's tokens live at
        # [0, row_lengths[r]) of its own cache row; the new token is
        # written at row_lengths[r] and may attend to [0, row_lengths[r]].
        if S != 1:
            raise ValueError("row_lengths decode supports single-token steps")
        _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
        mask = (
            _kv_pos[None, None, None, :] <= row_lengths[:, None, None, None]
        )
    else:
        mask = causal_mask(S, S_max, start)[None, None]
        if pad_start is not None:
            # left-padded batching: row r ignores kv positions < pad_start[r]
            _kv_pos = jnp.arange(S_max, dtype=jnp.int32)
            mask = mask & (
                _kv_pos[None, None, None, :] >= pad_start[:, None, None, None]
            )
    scale = 1.0 / (D**0.5)

    moe_cfg = MoeConfig(
        num_experts=cfg.n_routed_experts or 0,
        top_k=cfg.num_experts_per_tok or 1,
        scoring=cfg.scoring_func or "softmax",
        norm_topk_prob=cfg.norm_topk_prob,
        routed_scaling_factor=cfg.routed_scaling_factor,
    )

    zero = jnp.int32(0)

    from ...ops.linear import split_quantized as _split_quantized
    from ...ops.linear import with_quantized as _with_quantized

    dense_q, dense_xs = (
        _split_quantized(params["dense_layers"]) if num_dense else ({}, {})
    )
    moe_q, moe_xs = _split_quantized(params["moe_layers"]) if num_moe else ({}, {})
    # quantized (EP-style) layouts replicate the slot cache — the slot
    # kernel's shard_map wrapper then runs replicated per shard instead
    # of head-sharded (engine.new_slot_cache chooses the same split)
    slot_cache_replicated = bool(dense_q or moe_q)

    def attn_block(x, k_all, v_all, ks_all, vs_all, layer, li):
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
        v = v.reshape(B, S, NKV, DV).transpose(0, 2, 1, 3)
        q = _partial_rope(q, cos, sin, rope_dim, cfg.use_mla)
        k = _partial_rope(k, cos, sin, rope_dim, cfg.use_mla)
        # In-place updates on the scan carry (XLA aliases the buffers;
        # the old slice/concat layout copied the whole cache every step).
        if ks_all is not None and page_tables is None:
            # int8 KV (contiguous slot decode): store codes + per-token
            # scales, attend straight from the codes (ops.attention helper)
            from ...ops.attention import slot_kv_write_attend

            attn, k_all, v_all, ks_all, vs_all = slot_kv_write_attend(
                q, k, v, k_all, v_all, ks_all, vs_all, li, row_lengths,
                mask, scale, mesh=mesh,
                cache_replicated=slot_cache_replicated,
            )
            attn = _proj(attn, layer["o_proj"])
            x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)
            return x, k_all, v_all, ks_all, vs_all
        if page_tables is not None:
            # paged write: the new token's KV goes to its row's page
            # page_tables[r][len // page] at offset len % page — via the
            # ALIASED Pallas update when the kernel path is on (an XLA
            # scatter feeding the paged attend kernel forces a full pool
            # copy per layer; see paged_attention.py paged_kv_update)
            import os as _os

            _flag = _os.environ.get("DSOCR_SLOT_ATTN_KERNEL", "")
            _use_kernel = _flag == "1" or (
                _flag != "0" and jax.default_backend() == "tpu"
            )
            if ks_all is not None:
                # int8 paged pool: quantize the new token on device
                from ...ops.attention import quantize_kv_int8

                k_q, k_s = quantize_kv_int8(k)
                v_q, v_s = quantize_kv_int8(v)
                new = (k_q[:, :, 0, :], v_q[:, :, 0, :],
                       k_s[:, :, 0], v_s[:, :, 0])
            else:
                new = (k[:, :, 0, :].astype(k_all.dtype),
                       v[:, :, 0, :].astype(v_all.dtype), None, None)
            updated = None
            if _use_kernel:
                if mesh is not None:
                    from ...ops.pallas.paged_attention import (
                        paged_kv_update_mesh,
                    )

                    updated = paged_kv_update_mesh(
                        k_all, v_all, ks_all, vs_all, *new,
                        page_tables, row_lengths, li, mesh=mesh,
                        cache_replicated=slot_cache_replicated,
                    )
                else:
                    from ...ops.pallas.paged_attention import (
                        paged_kv_update_auto,
                    )

                    updated = paged_kv_update_auto(
                        k_all, v_all, ks_all, vs_all, *new,
                        page_tables, row_lengths, li,
                    )
            if updated is not None:
                k_all, v_all, ks2, vs2 = updated
                if ks_all is not None:
                    ks_all, vs_all = ks2, vs2
            else:
                page = k_all.shape[3]
                rows = jnp.arange(B)
                pids = page_tables[rows, row_lengths // page]
                offs = row_lengths % page
                k_all = k_all.at[li, pids, :, offs, :].set(new[0])
                v_all = v_all.at[li, pids, :, offs, :].set(new[1])
                if ks_all is not None:
                    ks_all = ks_all.at[li, pids, :, offs].set(new[2])
                    vs_all = vs_all.at[li, pids, :, offs].set(new[3])
        elif row_lengths is not None:
            # per-row write positions → scatter + attend (same shared
            # helper as the int8 branch; on TPU it runs the Pallas slot
            # kernel, which reads only [0, lengths[r]] of each row)
            from ...ops.attention import slot_kv_write_attend

            attn, k_all, v_all, _, _ = slot_kv_write_attend(
                q, k, v, k_all, v_all, None, None, li, row_lengths,
                mask, scale, mesh=mesh,
                cache_replicated=slot_cache_replicated,
            )
            attn = _proj(attn, layer["o_proj"])
            x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)
            return x, k_all, v_all, ks_all, vs_all
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None].astype(k_all.dtype), (li, zero, zero, start, zero)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None].astype(v_all.dtype), (li, zero, zero, start, zero)
            )
        if page_tables is not None:
            # whole pools + traced layer id ride into the kernel (never
            # feed a lax slice of a stacked buffer to a Pallas call)
            qf = q[:, :, 0, :].astype(jnp.float32)
            if mesh is not None:
                # shard_map per-shard (heads over mp when divisible,
                # redundant-replicated otherwise — pool_sharding's rule)
                from ...ops.pallas.paged_attention import (
                    paged_decode_attention_mesh,
                )

                ctx = paged_decode_attention_mesh(
                    qf, k_all, v_all, page_tables, row_lengths, li,
                    scale=scale, mesh=mesh,
                    cache_replicated=slot_cache_replicated,
                    ks_pool=ks_all, vs_pool=vs_all,
                )
            else:
                from ...ops.pallas.paged_attention import (
                    paged_decode_attention_auto,
                )

                ctx = paged_decode_attention_auto(
                    qf, k_all, v_all, page_tables, row_lengths, li,
                    scale=scale, ks_pool=ks_all, vs_pool=vs_all,
                )
            attn = ctx[:, None, :].astype(q.dtype)  # [B, 1, H*Dv]
        elif flash_prefill and S > 1:
            # Prefill always starts from an empty cache (engine invariant:
            # _prefill_impl / prefill_for_slot / the no-cache variant all
            # build a fresh cache), so attention needs only the locally
            # computed K/V — the Pallas kernel never materializes the
            # [B, H, S, S_max] f32 score tensor the XLA path builds.
            attn = flash_prefill_attention_auto(
                q, k.astype(q.dtype), v.astype(q.dtype), pad_start, scale=scale,
                mesh=mesh,
            )
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            attn = attention(
                q, k_layer.astype(q.dtype), v_layer.astype(q.dtype), mask, scale
            )
        attn = _proj(attn, layer["o_proj"])
        x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(x.dtype)
        return x, k_all, v_all, ks_all, vs_all

    def dense_body(carry, xs):
        x, k_all, v_all, ks_all, vs_all = carry
        layer_xs, li = xs
        layer = _with_quantized(layer_xs, dense_q, li)
        x, k_all, v_all, ks_all, vs_all = attn_block(
            x, k_all, v_all, ks_all, vs_all, layer, li
        )
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

    def moe_body(carry, xs):
        x, k_all, v_all, ks_all, vs_all = carry
        layer_xs, li = xs
        layer = _with_quantized(layer_xs, moe_q, li - num_dense)
        x, k_all, v_all, ks_all, vs_all = attn_block(
            x, k_all, v_all, ks_all, vs_all, layer, li
        )
        normed = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        tokens = normed.reshape(B * S, H)
        weights, indices = moe_router(
            tokens, layer["gate_weight"], moe_cfg,
            aux_bias=layer.get("gate_bias"),
        )
        ed = layer["experts_down"]
        quant_types = (dict, LayeredQ8, LayeredKQuant)
        if "experts_gateup" in layer:
            egu = layer["experts_gateup"]
            # gather kernels need EVERY stack packed; a group may be
            # mixed quant/float when one projection's in_dim misses the
            # block size — that group prefers the dequant float path
            all_quant = isinstance(egu, quant_types) and isinstance(ed, quant_types)
            if all_quant and B * S <= 32:  # decode: kernels read packed bytes
                if mesh is not None:
                    # EP: stacks are E-sharded; Pallas has no GSPMD rule,
                    # so the gather kernels run per-shard (ops.moe EP)
                    from ...ops.moe import moe_apply_quant_ep_fused

                    routed = moe_apply_quant_ep_fused(
                        tokens, weights, indices, egu, ed, mesh
                    )
                else:
                    routed = moe_apply_quant_fused(tokens, weights, indices, egu, ed)
            elif isinstance(egu, quant_types) or isinstance(ed, quant_types):
                # prefill (or mixed): once-per-layer dequant → grouped matmul
                routed = moe_apply_fused(
                    tokens, weights, indices,
                    dequant_stack(egu), dequant_stack(ed),
                )
            else:
                routed = moe_apply_fused(tokens, weights, indices, egu, ed)
        else:
            eg = layer["experts_gate"]
            eu = layer["experts_up"]
            all_quant = all(
                isinstance(w, quant_types) for w in (eg, eu, ed)
            )
            if all_quant and B * S <= 32:
                if mesh is not None:
                    from ...ops.moe import moe_apply_quant_ep

                    routed = moe_apply_quant_ep(
                        tokens, weights, indices, eg, eu, ed, mesh
                    )
                else:
                    routed = moe_apply_quant(tokens, weights, indices, eg, eu, ed)
            elif any(isinstance(w, quant_types) for w in (eg, eu, ed)):
                routed = moe_apply(
                    tokens, weights, indices,
                    dequant_stack(eg), dequant_stack(eu),
                    dequant_stack(ed),
                )
            else:
                routed = moe_apply(tokens, weights, indices, eg, eu, ed)
        out = routed.astype(jnp.float32)
        if "shared_gateup" in layer:
            sgu = _proj(normed, layer["shared_gateup"]).astype(jnp.float32)
            sg, su = jnp.split(sgu, 2, axis=-1)
            shared = _proj(
                (jax.nn.silu(sg) * su).astype(x.dtype), layer["shared_down"]
            )
            out = out + shared.reshape(B * S, H).astype(jnp.float32)
        elif "shared_gate" in layer:
            sg = _proj(normed, layer["shared_gate"]).astype(jnp.float32)
            su = _proj(normed, layer["shared_up"]).astype(jnp.float32)
            shared = _proj(
                (jax.nn.silu(sg) * su).astype(x.dtype), layer["shared_down"]
            )
            out = out + shared.reshape(B * S, H).astype(jnp.float32)
        x = (x.astype(jnp.float32) + out.reshape(B, S, H)).astype(x.dtype)
        return (x, k_all, v_all, ks_all, vs_all), None

    if cache.k_scale is not None and (S != 1 or row_lengths is None):
        raise ValueError("int8 KV cache supports single-token slot steps only")
    carry = (embeds, cache.k, cache.v, cache.k_scale, cache.v_scale)
    if num_dense:
        idx = jnp.arange(num_dense, dtype=jnp.int32)
        carry, _ = jax.lax.scan(dense_body, carry, (dense_xs, idx))
    if num_moe:
        idx = jnp.arange(num_dense, num_dense + num_moe, dtype=jnp.int32)
        carry, _ = jax.lax.scan(moe_body, carry, (moe_xs, idx))
    x, new_k, new_v, new_ks, new_vs = carry
    cache = KVCache(
        k=new_k, v=new_v, length=cache.length, k_scale=new_ks, v_scale=new_vs
    )

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed_tokens"].T
    if isinstance(head, dict):  # packed quant lm_head
        method = quant_method(head)
        if method == "q8_0":
            from ...ops.pallas.dequant_matmul import q8_matmul_auto

            head_mm = lambda t: q8_matmul_auto(t, head["codes"], head["scales"])
        else:
            from ...ops.pallas.kquant_matmul import q4k_matmul_auto, q6k_matmul_auto

            kq = q4k_matmul_auto if method == "q4_k" else q6k_matmul_auto
            head_mm = lambda t: kq(t, head)
        if full_logits:
            flat = head_mm(x.reshape(B * S, H))
            return flat.reshape(B, S, -1).astype(jnp.float32), cache
        if last_index is None:
            x_last = x[:, -1]
        else:
            x_last = jnp.take_along_axis(x, last_index[:, None, None], axis=1)[:, 0]
        return head_mm(x_last), cache
    if full_logits:
        logits = jnp.einsum("bsh,hv->bsv", x, head, preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32), cache
    if last_index is None:
        x_last = x[:, -1]
    else:
        x_last = jnp.take_along_axis(x, last_index[:, None, None], axis=1)[:, 0]
    logits = jnp.einsum("bh,hv->bv", x_last, head, preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), cache


def build_decoder_rope(cfg: DeepseekV2Config, max_len: int):
    return build_rope_tables(max_len, cfg.rope_dim, cfg.rope_theta)
