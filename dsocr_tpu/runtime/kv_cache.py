"""Static-shape KV cache.

The reference grows a chunked cache per layer and lazily concatenates
views (crates/core/src/cache.rs). XLA wants static shapes, so we
preallocate ``[layers, batch, kv_heads, max_seq, head_dim]`` buffers and
track one logical length; attention masks out unwritten positions. The
reference's ``PromptCacheGuard`` reset becomes ``length = 0`` (buffers
need no clearing — masking hides stale data).

Layout note: seq is the second-to-last axis so decode-step writes of
[B, H, 1, D] are contiguous lane-dim updates, and attention reads tile
cleanly onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, H_kv, S_max, Dk] (model dtype, or int8 codes)
    v: jnp.ndarray  # [L, B, H_kv, S_max, Dv]
    length: jnp.ndarray  # scalar int32: number of valid positions
    # int8-quantized cache (slot decode): per-(layer,row,head,token) f32
    # scales; see ops.attention.attention_kv_int8
    k_scale: Optional[jnp.ndarray] = None  # [L, B, H_kv, S_max]
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_kv_cache(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    max_len: int,
    k_head_dim: int,
    v_head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    cache = KVCache(
        k=jnp.zeros((num_layers, batch, num_kv_heads, max_len, k_head_dim), dtype),
        v=jnp.zeros((num_layers, batch, num_kv_heads, max_len, v_head_dim), dtype),
        length=jnp.zeros((), jnp.int32),
    )
    from ..core import memlog

    if memlog.enabled():
        memlog.set_kv(cache.k.nbytes + cache.v.nbytes)
        memlog.log_snapshot("kv_cache.init")
    return cache


def write_kv(
    cache: KVCache,
    layer: int,
    k_new: jnp.ndarray,  # [B, H_kv, S_new, Dk]
    v_new: jnp.ndarray,  # [B, H_kv, S_new, Dv]
    start,  # scalar int32 (traced ok): position to write at
) -> KVCache:
    """Write new K/V at [start, start+S_new) for one layer. Does NOT bump
    `length` — the model bumps it once per forward after all layers."""
    zero = jnp.int32(0)
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new[None].astype(cache.k.dtype), (layer, zero, zero, start, zero)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new[None].astype(cache.v.dtype), (layer, zero, zero, start, zero)
    )
    return cache._replace(k=k, v=v)


def layer_kv(cache: KVCache, layer: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full (k, v) buffers for a layer: [B, H_kv, S_max, D]."""
    return cache.k[layer], cache.v[layer]


def bump_length(cache: KVCache, amount) -> KVCache:
    return cache._replace(length=cache.length + jnp.int32(amount))


def reset(cache: KVCache) -> KVCache:
    """PromptCacheGuard semantics: logical wipe between requests."""
    return cache._replace(length=jnp.zeros((), jnp.int32))
