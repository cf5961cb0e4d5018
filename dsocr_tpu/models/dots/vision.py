"""DotsVision ViT.

Structure mirrors infer-dots/src/vision/dots_vit.rs: conv patch embed +
RMSNorm, blocks of (RMSNorm → per-frame full attention with 2D rotary →
residual → RMSNorm → SwiGLU FFN → residual), optional post-trunk RMSNorm,
then a PatchMerger (LayerNorm → merge² grouping → MLP) to the language
hidden size. Multiple images pack into one token sequence
(SequenceLayout); attention is blocked per frame.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import layer_norm, rms_norm, rotate_half
from .config import DotsVisionConfig


@dataclasses.dataclass(frozen=True)
class SequenceLayout:
    """Packed multi-image token layout (ref dots_vit.rs:103-218)."""

    frames: Tuple[Tuple[int, int], ...]  # (start, len)
    total_tokens: int
    merge_groups: int
    positions: np.ndarray  # [total, 2] (h, w), merge-window order

    @classmethod
    def from_grid(cls, grid_thw: Sequence[Tuple[int, int, int]], merge: int):
        frames: List[Tuple[int, int]] = []
        positions: List[np.ndarray] = []
        total = 0
        groups = 0
        for t, h, w in grid_thw:
            assert h % merge == 0 and w % merge == 0, (
                f"grid {h}x{w} not divisible by merge {merge}"
            )
            frame_positions = _frame_positions(h, w, merge)
            for _ in range(t):
                frames.append((total, h * w))
                total += h * w
                groups += (h * w) // (merge * merge)
                positions.append(frame_positions)
        return cls(
            frames=tuple(frames),
            total_tokens=total,
            merge_groups=groups,
            positions=np.concatenate(positions) if positions else np.zeros((0, 2), np.int32),
        )

    @property
    def uniform_frame_len(self):
        lens = {length for _, length in self.frames if length > 0}
        return lens.pop() if len(lens) == 1 else None


def _frame_positions(h: int, w: int, merge: int) -> np.ndarray:
    """(h, w) per patch in merge-window order (ref build_frame_positions)."""
    out = np.empty((h * w, 2), np.int32)
    i = 0
    for bh in range(h // merge):
        for bw in range(w // merge):
            for ih in range(merge):
                for iw in range(merge):
                    out[i] = (bh * merge + ih, bw * merge + iw)
                    i += 1
    return out


def init_dots_vision_params(
    cfg: DotsVisionConfig, key: jax.Array, dtype=jnp.float32
) -> Dict:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_hidden_layers))
    E = cfg.embed_dim
    I = cfg.intermediate_size
    merged = E * cfg.spatial_merge_size**2

    def lin(k, i, o, bias=True):
        out = {"w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype)}
        out["b"] = jnp.zeros((o,), dtype) if bias else None
        return out

    params = {
        "patch_embed": {
            "w": (
                jax.random.normal(
                    next(keys), (E, cfg.num_channels, cfg.patch_size, cfg.patch_size)
                )
                * 0.02
            ).astype(dtype),
            "b": jnp.zeros((E,), dtype),
            "norm": jnp.ones((E,), dtype),
        },
        "post_trunk_norm": jnp.ones((E,), dtype) if cfg.post_norm else None,
        "merger": {
            "ln_q": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
            "mlp_in": lin(next(keys), merged, merged),
            "mlp_out": lin(next(keys), merged, cfg.hidden_size),
        },
        "blocks": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["blocks"].append(
            {
                "norm1": jnp.ones((E,), dtype),
                "norm2": jnp.ones((E,), dtype),
                "qkv": lin(next(keys), E, 3 * E, bias=cfg.use_bias),
                "proj": lin(next(keys), E, E, bias=cfg.use_bias),
                "fc1": lin(next(keys), E, I, bias=cfg.use_bias),
                "fc2": lin(next(keys), I, E, bias=cfg.use_bias),
                "fc3": lin(next(keys), E, I, bias=cfg.use_bias),
            }
        )
    return params


def _linear(x, p):
    out = jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=jnp.float32)
    if p.get("b") is not None:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def build_2d_rope(positions: np.ndarray, head_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, head_dim] (cos, sin): angles are [h·f..., w·f...] duplicated
    (ref VisionRotaryEmbedding + apply_rotary, dots_vit.rs:696-733,507-554)."""
    cos, sin = build_2d_rope_np(positions, head_dim)
    return jnp.asarray(cos), jnp.asarray(sin)


def _rope_apply(x, cos, sin):
    x32 = x.astype(jnp.float32)
    return (x32 * cos[:, None] + rotate_half(x32) * sin[:, None]).astype(x.dtype)


def _trunk_and_merge(params, cfg: DotsVisionConfig, patches, cos, sin, attn_fn):
    """Shared trunk: patch embed → blocks (attention via `attn_fn`) →
    optional post norm → PatchMerger. Returns [n/merge², hidden]."""
    n = patches.shape[0]
    E = cfg.embed_dim
    NH = cfg.num_attention_heads
    D = cfg.head_dim
    # conv patch embed == flattened linear on [N, C*p*p]
    w = params["patch_embed"]["w"].reshape(E, -1).T
    x = jnp.einsum(
        "ni,ie->ne", patches.reshape(n, -1), w, preferred_element_type=jnp.float32
    )
    x = (x + params["patch_embed"]["b"].astype(jnp.float32)).astype(patches.dtype)
    x = rms_norm(x, params["patch_embed"]["norm"], cfg.rms_norm_eps)

    for blk in params["blocks"]:
        normed = rms_norm(x, blk["norm1"], cfg.rms_norm_eps)
        qkv = _linear(normed, blk["qkv"]).reshape(n, 3, NH, D)
        q = _rope_apply(qkv[:, 0], cos, sin)
        k = _rope_apply(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        ctx = attn_fn(q, k, v)
        x = (x.astype(jnp.float32) + _linear(ctx, blk["proj"]).astype(jnp.float32)).astype(x.dtype)

        normed = rms_norm(x, blk["norm2"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_linear(normed, blk["fc1"]).astype(jnp.float32))
        up = _linear(normed, blk["fc3"]).astype(jnp.float32)
        mlp = _linear((gate * up).astype(x.dtype), blk["fc2"])
        x = (x.astype(jnp.float32) + mlp.astype(jnp.float32)).astype(x.dtype)

    if params.get("post_trunk_norm") is not None:
        x = rms_norm(x, params["post_trunk_norm"], cfg.rms_norm_eps)

    # PatchMerger: LN → [groups, E·merge²] → linear → GELU(tanh, candle
    # Tensor::gelu) → linear
    m = params["merger"]
    normed = layer_norm(x, m["ln_q"]["w"], m["ln_q"]["b"], eps=1e-6)
    grouped = normed.reshape(
        n // cfg.spatial_merge_size**2, E * cfg.spatial_merge_size**2
    )
    h = jax.nn.gelu(
        _linear(grouped, m["mlp_in"]).astype(jnp.float32), approximate=True
    ).astype(x.dtype)
    return _linear(h, m["mlp_out"])


def dots_vision_forward(
    params: Dict,
    cfg: DotsVisionConfig,
    patches: jnp.ndarray,  # [N, C, p, p]
    layout: SequenceLayout,
) -> jnp.ndarray:
    """Returns [merge_groups, hidden_size] merged vision tokens (eager
    reference path; serving uses the jitted dots_vision_forward_packed)."""
    n = patches.shape[0]
    NH = cfg.num_attention_heads
    D = cfg.head_dim
    cos, sin = build_2d_rope(layout.positions, D)
    frame_len = layout.uniform_frame_len

    def attn_fn(q, k, v):
        if frame_len is not None:
            nf = n // frame_len
            qf = q.reshape(nf, frame_len, NH, D).transpose(0, 2, 1, 3)
            kf = k.reshape(nf, frame_len, NH, D).transpose(0, 2, 1, 3)
            vf = v.reshape(nf, frame_len, NH, D).transpose(0, 2, 1, 3)
            ctx = _frame_attention(qf, kf, vf)
            return ctx.transpose(0, 2, 1, 3).reshape(n, NH * D)
        parts = []
        for start, length in layout.frames:
            if length == 0:
                continue
            qf = q[start : start + length].transpose(1, 0, 2)[None]
            kf = k[start : start + length].transpose(1, 0, 2)[None]
            vf = v[start : start + length].transpose(1, 0, 2)[None]
            ctx = _frame_attention(qf, kf, vf)
            parts.append(ctx[0].transpose(1, 0, 2).reshape(length, NH * D))
        return jnp.concatenate(parts, axis=0)

    return _trunk_and_merge(params, cfg, patches, cos, sin, attn_fn)


def dots_vision_forward_packed(
    params: Dict,
    patches: jnp.ndarray,  # [N_pad, C, p, p], zero-padded
    cos: jnp.ndarray,  # [N_pad, head_dim]
    sin: jnp.ndarray,
    seg: jnp.ndarray,  # [N_pad] int32 frame id, -1 for padding
    *,
    cfg: DotsVisionConfig,
) -> jnp.ndarray:
    """Jittable packed-sequence tower (one compile per padded-length
    bucket; frame isolation via ops/packed_attention.segment_attention —
    the same fix that took GLM's tower from eager op-by-op dispatch to
    one engine pass). Returns [N_pad/merge², hidden]; callers slice
    [:layout.merge_groups]."""
    NH = cfg.num_attention_heads
    D = cfg.head_dim
    n = patches.shape[0]

    from ...ops.packed_attention import segment_attention

    def attn_fn(q, k, v):
        return segment_attention(q, k, v, seg).reshape(n, NH * D)

    return _trunk_and_merge(params, cfg, patches, cos, sin, attn_fn)


def build_2d_rope_np(positions: np.ndarray, head_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy (cos, sin) for the packed path (padded host-side)."""
    rope_dim = head_dim // 2
    axis_dim = rope_dim // 2
    inv_freq = 1.0 / np.power(
        10000.0, (2 * np.arange(axis_dim, dtype=np.float32)) / rope_dim
    )
    h_angles = positions[:, 0:1].astype(np.float32) * inv_freq
    w_angles = positions[:, 1:2].astype(np.float32) * inv_freq
    half = np.concatenate([h_angles, w_angles], axis=1)
    full = np.concatenate([half, half], axis=1)
    return np.cos(full), np.sin(full)


def _frame_attention(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
