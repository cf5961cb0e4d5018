"""mlp_AR projector: pre-LayerNorm → 2×2 spatial merge → linear → GELU
(tanh approximation, matching candle's Tensor::gelu) → linear to the
language hidden size. Ref: infer-paddleocr/src/vision/projector.rs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops import gelu_tanh, layer_norm
from .config import PaddleConfig


def init_projector_params(cfg: PaddleConfig, key: jax.Array, dtype=jnp.bfloat16) -> Dict:
    v = cfg.vision_config
    merged = v.hidden_size * v.spatial_merge_size**2
    k1, k2 = jax.random.split(key)
    return {
        "pre_norm": {
            "w": jnp.ones((v.hidden_size,), dtype),
            "b": jnp.zeros((v.hidden_size,), dtype),
        },
        "linear_1": {
            "w": (jax.random.normal(k1, (merged, merged)) * (merged**-0.5)).astype(dtype),
            "b": jnp.zeros((merged,), dtype),
        },
        "linear_2": {
            "w": (jax.random.normal(k2, (merged, cfg.hidden_size)) * (merged**-0.5)).astype(dtype),
            "b": jnp.zeros((cfg.hidden_size,), dtype),
        },
    }


def merge_reshape(
    features: jnp.ndarray,  # [t*h*w, H]
    grid: Tuple[int, int, int],
    merge: int,
) -> jnp.ndarray:
    """[t, h, w, H] → merge² spatial grouping → [t*(h/m)*(w/m), H*m²]."""
    t, h, w = grid
    hidden = features.shape[-1]
    x = features.reshape(t, h // merge, merge, w // merge, merge, hidden)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(t * (h // merge) * (w // merge), hidden * merge * merge)


def projector_forward(
    params: Dict,
    cfg: PaddleConfig,
    features: jnp.ndarray,  # [t*h*w, vision_hidden]
    grid: Tuple[int, int, int],
) -> jnp.ndarray:
    """Returns [t*(h/m)*(w/m), language_hidden]."""
    merge = cfg.vision_config.spatial_merge_size
    normed = layer_norm(
        features, params["pre_norm"]["w"], params["pre_norm"]["b"], eps=1e-5
    )
    merged = merge_reshape(normed, grid, merge)
    h = jnp.einsum(
        "ni,io->no", merged, params["linear_1"]["w"],
        preferred_element_type=jnp.float32,
    ) + params["linear_1"]["b"].astype(jnp.float32)
    h = gelu_tanh(h)
    out = jnp.einsum(
        "ni,io->no", h.astype(features.dtype), params["linear_2"]["w"],
        preferred_element_type=jnp.float32,
    ) + params["linear_2"]["b"].astype(jnp.float32)
    return out.astype(features.dtype)
