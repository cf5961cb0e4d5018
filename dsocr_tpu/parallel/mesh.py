"""Device mesh + sharding specs for the DeepSeek-V2 decoder.

Sharding layout (("dp", "mp") mesh):
- attention q/k/v projections: shard the fused head-output dim over mp
  (head-parallel TP); o_proj shards its input dim and psums the output;
- dense MLP gate/up shard the intermediate dim over mp; down shards its
  input dim (psum on exit);
- MoE expert stacks [L, E, H, I]: shard the intermediate dim over mp —
  every device holds a slice of every expert, so `ragged_dot` partitions
  without all_to_all and combines with one psum (expert-tensor
  parallelism; classic EP over the E axis is a later optimization);
- embeddings / lm_head: shard the vocab dim over mp;
- KV cache: shard kv heads over mp when divisible, else replicate;
- activations and token buffers: batch over dp.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None:
        dp = 1
        # prefer model parallelism for inference; dp grows only if asked
    mp = n // dp
    return Mesh(devices.reshape(dp, mp), axis_names=("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def cache_sharding(mesh: Mesh, num_kv_heads: int) -> NamedSharding:
    mp = mesh.shape["mp"]
    if num_kv_heads % mp == 0:
        # [L, B, H_kv, S, D] — heads over mp, batch over dp
        return NamedSharding(mesh, P(None, "dp", "mp", None, None))
    return NamedSharding(mesh, P(None, "dp", None, None, None))


_warned_fallbacks: set = set()


def _warn_replicated(axis: str, dim: str, n: int, size: int) -> None:
    """One-time visibility when a requested mesh axis silently falls back
    to replication (r4 advisor: a user asking for dp must see in the
    serving log that they got none)."""
    key = (axis, dim, n, size)
    if key in _warned_fallbacks:
        return
    _warned_fallbacks.add(key)
    import logging

    logging.getLogger("dsocr.mesh").warning(
        "mesh axis %r (size %d) does not divide %s=%d; replicating that "
        "dimension instead — no %s parallelism for the slot KV cache",
        axis, size, dim, n, axis,
    )


def slot_cache_sharding(
    mesh: Mesh, num_kv_heads: int, n_slots: int
) -> NamedSharding:
    """Slot KV cache [L, B, H_kv, S, D]: like cache_sharding but each
    axis shards only when it actually divides — a dp larger than the
    slot count must fall back to replicating B (device_put raises
    otherwise, which r4 found as a prefill-worker deadlock)."""
    b = "dp" if n_slots % mesh.shape["dp"] == 0 else None
    h = "mp" if num_kv_heads % mesh.shape["mp"] == 0 else None
    if b is None and mesh.shape["dp"] > 1:
        _warn_replicated("dp", "n_slots", n_slots, mesh.shape["dp"])
    if h is None and mesh.shape["mp"] > 1:
        _warn_replicated("mp", "num_kv_heads", num_kv_heads, mesh.shape["mp"])
    return NamedSharding(mesh, P(None, b, h, None, None))


def slot_scale_sharding(
    mesh: Mesh, num_kv_heads: int, n_slots: int
) -> NamedSharding:
    """int8 KV scale planes [L, B, H_kv, S] matching slot_cache_sharding."""
    b = "dp" if n_slots % mesh.shape["dp"] == 0 else None
    h = "mp" if num_kv_heads % mesh.shape["mp"] == 0 else None
    return NamedSharding(mesh, P(None, b, h, None))


def scale_sharding(mesh: Mesh, num_kv_heads: int) -> NamedSharding:
    """int8 KV scale planes [L, B, H_kv, S]: same layout as the cache
    they describe (heads over mp, batch over dp), minus the D dim."""
    mp = mesh.shape["mp"]
    if num_kv_heads % mp == 0:
        return NamedSharding(mesh, P(None, "dp", "mp", None))
    return NamedSharding(mesh, P(None, "dp", None, None))


def row_cache_sharding(mesh: Mesh, num_kv_heads: int) -> NamedSharding:
    """Single-row KV block [L, 1, H_kv, s_pad, D] (slot prefill): heads
    over mp only — B=1 cannot shard over dp."""
    mp = mesh.shape["mp"]
    if num_kv_heads % mp == 0:
        return NamedSharding(mesh, P(None, None, "mp", None, None))
    return NamedSharding(mesh, P())


def pool_sharding(mesh: Mesh, num_kv_heads: int, num_heads: int) -> NamedSharding:
    """Paged page pool [L, P, H_kv, page, D]: heads over mp when BOTH the
    query and KV head counts divide (the paged kernel shard_maps over the
    head axis, so the q heads must split the same way). The page axis is
    shared by every row and therefore can never shard over dp — rows
    replicate instead. Replicated when heads don't divide."""
    mp = mesh.shape["mp"]
    if num_kv_heads % mp == 0 and num_heads % mp == 0:
        return NamedSharding(mesh, P(None, None, "mp", None, None))
    return NamedSharding(mesh, P())


def pool_scale_sharding(
    mesh: Mesh, num_kv_heads: int, num_heads: int
) -> NamedSharding:
    """int8 paged-pool scale planes [L, P, H_kv, page]: same layout as
    the pool they describe, minus the D dim."""
    mp = mesh.shape["mp"]
    if num_kv_heads % mp == 0 and num_heads % mp == 0:
        return NamedSharding(mesh, P(None, None, "mp", None))
    return NamedSharding(mesh, P())


def deepseek_param_shardings(params: Dict, mesh: Mesh, ep: bool = False) -> Dict:
    """PartitionSpec tree matching init_deepseek_params' layout.

    ep=True switches the routed-expert stacks from intermediate-dim TP
    to classic expert parallelism (the E axis sharded over mp — the
    reference explicitly bails on ep_size > 1, block.rs:1248-1252);
    GSPMD inserts the all-gather/psum around the grouped matmuls."""

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    def attn_specs():
        return {
            "input_layernorm": ns(),
            "post_attention_layernorm": ns(),
            "q_proj": ns(None, None, "mp"),
            "k_proj": ns(None, None, "mp"),
            "v_proj": ns(None, None, "mp"),
            "o_proj": ns(None, "mp", None),
        }

    specs: Dict[str, Any] = {
        "embed_tokens": ns("mp", None),
        "norm": ns(),
        "lm_head": ns(None, "mp"),
    }
    if "dense_layers" in params:
        specs["dense_layers"] = {
            **attn_specs(),
            "gate_proj": ns(None, None, "mp"),
            "up_proj": ns(None, None, "mp"),
            "down_proj": ns(None, "mp", None),
        }
    if "moe_layers" in params:
        if ep:
            expert_specs = {
                "experts_gate": ns(None, "mp", None, None),
                "experts_up": ns(None, "mp", None, None),
                "experts_down": ns(None, "mp", None, None),
            }
        else:
            expert_specs = {
                "experts_gate": ns(None, None, None, "mp"),
                "experts_up": ns(None, None, None, "mp"),
                "experts_down": ns(None, None, "mp", None),
            }
        moe = {
            **attn_specs(),
            "gate_weight": ns(),
            **expert_specs,
        }
        if "shared_gate" in params["moe_layers"]:
            moe["shared_gate"] = ns(None, None, "mp")
            moe["shared_up"] = ns(None, None, "mp")
            moe["shared_down"] = ns(None, "mp", None)
        specs["moe_layers"] = moe

    # anything not covered explicitly → replicated
    def fill(p, s):
        if isinstance(p, dict):
            return {k: fill(p[k], s.get(k) if isinstance(s, dict) else None) for k in p}
        return s if s is not None else ns()

    return fill(params, specs)
