"""Pallas SAM global-attention kernel vs naive decomposed-bias attention.

The kernel reconstructs bias[i, j] = bias_h[i, j//W] + bias_w[i, j%W]
tile-wise in VMEM (ref computes the full [S, S] bias host-side,
sam.rs:1124-1196). Runs in interpret mode on the CPU test mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsocr_tpu.ops.pallas.sam_attention import sam_flash_attention


def _naive(q, k, v, bh, bw, width):
    col = np.arange(q.shape[1])
    bias = bh[:, :, col // width] + bw[:, :, col % width]
    scores = np.einsum("bqd,bkd->bqk", q, k) + bias
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", p, v)


@pytest.mark.parametrize("qh,qw,block_q", [(4, 6, 8), (4, 4, 16), (5, 3, 8)])
def test_sam_flash_matches_naive(qh, qw, block_q):
    rng = np.random.default_rng(qh * 31 + qw)
    BH, D = 3, 8
    S = qh * qw
    q = rng.normal(size=(BH, S, D)).astype(np.float32) * 0.3
    k = rng.normal(size=(BH, S, D)).astype(np.float32) * 0.3
    v = rng.normal(size=(BH, S, D)).astype(np.float32)
    bh = rng.normal(size=(BH, S, qh)).astype(np.float32) * 0.2
    bw = rng.normal(size=(BH, S, qw)).astype(np.float32) * 0.2

    out = np.asarray(
        sam_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bh), jnp.asarray(bw),
            width=qw, block_q=block_q, interpret=True,
        )
    )
    np.testing.assert_allclose(out, _naive(q, k, v, bh, bw, qw), rtol=1e-5, atol=1e-5)


def test_sam_flash_uneven_q_blocks():
    """S not a multiple of block_q exercises the padded final block."""
    rng = np.random.default_rng(9)
    BH, D, qh, qw = 2, 8, 5, 4
    S = qh * qw  # 20, block_q 16 → blocks of 16 + 4
    q = rng.normal(size=(BH, S, D)).astype(np.float32) * 0.3
    k = rng.normal(size=(BH, S, D)).astype(np.float32) * 0.3
    v = rng.normal(size=(BH, S, D)).astype(np.float32)
    bh = rng.normal(size=(BH, S, qh)).astype(np.float32) * 0.2
    bw = rng.normal(size=(BH, S, qw)).astype(np.float32) * 0.2
    out = np.asarray(
        sam_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bh), jnp.asarray(bw),
            width=qw, block_q=16, interpret=True,
        )
    )
    np.testing.assert_allclose(out, _naive(q, k, v, bh, bw, qw), rtol=1e-5, atol=1e-5)
