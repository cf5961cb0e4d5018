"""Flash prefill-attention kernel vs the naive masked path.

Prefill attends only to the prompt's own K/V (empty cache — see
ops/pallas/prefill_attention.py docstring); the kernel must match
ops.attention called with the equivalent causal + left-pad mask.
Runs in interpret mode on the CPU test mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.ops import attention, causal_mask
from dsocr_tpu.ops.pallas.prefill_attention import (
    flash_prefill_attention,
    flash_prefill_attention_auto,
)


def _reference(q, k, v, pad_start, scale):
    """ops.attention with the decoder's prefill mask (start=0)."""
    S = q.shape[2]
    mask = np.asarray(causal_mask(S, S, 0))[None, None]
    if pad_start is not None:
        kv_pos = np.arange(S)
        mask = mask & (
            kv_pos[None, None, None, :] >= np.asarray(pad_start)[:, None, None, None]
        )
    return np.asarray(
        attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), scale,
        )
    )


@pytest.mark.parametrize("B,H,Hkv,S,D,block_q", [
    (2, 4, 4, 32, 16, 16),   # MHA, even blocks
    (1, 4, 2, 24, 8, 16),    # GQA group 2, uneven final block
    (2, 6, 2, 16, 8, 8),     # GQA group 3
])
def test_flash_prefill_matches_naive(B, H, Hkv, S, D, block_q):
    rng = np.random.default_rng(B * 131 + S)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32) * 0.4
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32) * 0.4
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    scale = 1.0 / D**0.5
    out = np.asarray(
        flash_prefill_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.zeros((B,), jnp.int32),
            scale=scale, block_q=block_q, interpret=True,
        )
    )
    np.testing.assert_allclose(
        out, _reference(q, k, v, None, scale), rtol=1e-5, atol=1e-5
    )


def test_flash_prefill_left_pad_rows():
    """Per-row pad_start: padded kv positions are invisible; padded query
    rows degrade to uniform attention exactly like the -1e30 XLA fill."""
    rng = np.random.default_rng(7)
    B, H, S, D = 3, 2, 32, 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32) * 0.4
    k = rng.normal(size=(B, H, S, D)).astype(np.float32) * 0.4
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    pad = np.array([0, 5, 17], np.int32)
    scale = 1.0 / D**0.5
    out = np.asarray(
        flash_prefill_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(pad), scale=scale, block_q=16, interpret=True,
        )
    )
    np.testing.assert_allclose(
        out, _reference(q, k, v, pad, scale), rtol=1e-5, atol=1e-5
    )


def test_flash_prefill_bf16_dtype_and_auto():
    """bf16 inputs: f32 accumulation inside, output back in bf16; the
    _auto wrapper defaults pad_start to zeros."""
    rng = np.random.default_rng(3)
    B, H, S, D = 2, 2, 16, 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    scale = 1.0 / D**0.5
    out = flash_prefill_attention_auto(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), scale=scale,
    )
    assert out.dtype == jnp.bfloat16
    assert out.shape == (B, S, H * D)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), _reference(q, k, v, None, scale),
        rtol=0.05, atol=0.05,
    )
