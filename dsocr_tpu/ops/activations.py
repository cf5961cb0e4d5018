"""Activation functions used across the model families."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — matches HF's `gelu` / candle's default."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's quick-gelu: x * sigmoid(1.702 x)
    (infer-deepseek/src/vision/clip.rs:413)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN = {
    "silu": silu,
    "gelu": gelu,
    "gelu_new": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}
