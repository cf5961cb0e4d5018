"""Segment-masked full attention over a packed (multi-image, padded)
vision token sequence.

Vision towers that pack several frames into one sequence (GLM
infer-glm/src/vision.rs:740, dots infer-dots/src/vision/dots_vit.rs
SequenceLayout) need block-diagonal attention: a token attends only its
own frame. For the JITTED padded-bucket tower path, the frame structure
is carried as per-token segment ids instead of Python-level slicing, so
one compiled graph serves every frame mix of the same padded length.

Masked keys contribute exact zeros to the online-softmax accumulation,
so real rows match the per-frame computation up to f32 reduction order.
Padded query rows (seg < 0 sentinels distinct from key padding) stay
fully masked or attend only padding — callers slice them off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bucket_tokens(n: int, mult: int, minimum: int = 1024) -> int:
    """Quarter-octave padded-length bucket (multiple of `mult`): bounds
    a packed tower's compile keys to ≤4 per power of two while capping
    padded-FLOP waste at ~28%."""
    if n <= minimum:
        b = minimum
    else:
        step = max((1 << (n.bit_length() - 1)) // 4, 1)
        b = -(-n // step) * step
    return -(-b // mult) * mult


def segment_attention(q, k, v, seg, query_chunk: int = 1024, key_chunk: int = 1024):
    """q/k/v: [N, NH, D]; seg: [N] int32 (−1 padding) → [N, NH, D].

    N ≤ query_chunk: one masked softmax (transient [NH, N, N] scores).
    Larger: online-softmax over (query, key) chunks — bounded HBM at the
    ~24k-token pixel budgets GLM reaches."""
    n = q.shape[0]
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    qh = q.transpose(1, 0, 2)  # [NH, N, D]
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)
    if n <= query_chunk:
        scores = (
            jnp.einsum("hqd,hkd->hqk", qh, kh, preferred_element_type=jnp.float32)
            * scale
        )
        mask = seg[:, None] == seg[None, :]
        scores = jnp.where(mask[None], scores.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "hqk,hkd->hqd", probs, vh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        return out.transpose(1, 0, 2)

    nh = qh.shape[0]
    n_q = -(-n // query_chunk)
    qp = jnp.pad(qh, ((0, 0), (0, n_q * query_chunk - n), (0, 0)))
    # distinct sentinels for q- vs k-side padding so a padded query never
    # matches a padded key (its row stays fully masked → exact zeros)
    segq = jnp.pad(seg, (0, n_q * query_chunk - n), constant_values=-2)
    n_k = -(-n // key_chunk)
    kp = jnp.pad(kh, ((0, 0), (0, n_k * key_chunk - n), (0, 0)))
    vp = jnp.pad(vh, ((0, 0), (0, n_k * key_chunk - n), (0, 0)))
    segk = jnp.pad(seg, (0, n_k * key_chunk - n), constant_values=-3)
    k_blocks = kp.reshape(nh, n_k, key_chunk, d).transpose(1, 0, 2, 3)
    v_blocks = vp.reshape(nh, n_k, key_chunk, d).transpose(1, 0, 2, 3)
    segk_blocks = segk.reshape(n_k, key_chunk)

    def attend(args):
        q_chunk, sq = args  # [NH, QC, D], [QC]
        acc0 = jnp.zeros((nh, query_chunk, d), jnp.float32)
        m0 = jnp.full((nh, query_chunk), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((nh, query_chunk), jnp.float32)

        def body(carry, xs):
            acc, m, l = carry
            k_blk, v_blk, sk = xs
            scores = (
                jnp.einsum(
                    "hqd,hkd->hqk", q_chunk, k_blk,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
                * scale
            )
            valid = sq[:, None] == sk[None, :]
            scores = jnp.where(valid[None], scores, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
            shift = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(scores - shift[..., None])
            correction = jnp.where(jnp.isfinite(m), jnp.exp(m - shift), 0.0)
            acc = acc * correction[..., None] + jnp.einsum(
                "hqk,hkd->hqd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            l = l * correction + jnp.sum(p, axis=-1)
            return (acc, m_new, l), None

        (acc, _, l), _ = jax.lax.scan(
            body, (acc0, m0, l0), (k_blocks, v_blocks, segk_blocks)
        )
        return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)

    q_chunks = qp.reshape(nh, n_q, query_chunk, d).transpose(1, 0, 2, 3)
    segq_chunks = segq.reshape(n_q, query_chunk)
    out = jax.lax.map(attend, (q_chunks, segq_chunks))  # [n_q, NH, QC, D]
    out = out.transpose(1, 0, 2, 3).reshape(nh, n_q * query_chunk, d)[:, :n]
    return out.transpose(1, 0, 2)
