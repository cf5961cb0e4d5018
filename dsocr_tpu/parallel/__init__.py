"""Mesh construction and sharding rules (TP/EP/DP over ICI).

The reference has no distributed execution at all (SURVEY.md §2.11); this
package is green-field TPU design: a 2D ("dp", "mp") mesh where the model
axis shards attention heads and MLP/expert intermediate dims (tensor
parallelism that also covers the MoE expert stacks), and the data axis
shards the batch. XLA GSPMD inserts the collectives.
"""

from .mesh import (
    make_mesh,
    deepseek_param_shardings,
    batch_sharding,
    replicated,
    cache_sharding,
    scale_sharding,
    slot_cache_sharding,
    slot_scale_sharding,
    row_cache_sharding,
    pool_sharding,
    pool_scale_sharding,
)

__all__ = [
    "pool_sharding",
    "pool_scale_sharding",
    "make_mesh",
    "deepseek_param_shardings",
    "batch_sharding",
    "replicated",
    "cache_sharding",
    "scale_sharding",
    "slot_cache_sharding",
    "slot_scale_sharding",
    "row_cache_sharding",
]
