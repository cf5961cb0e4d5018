"""SAM ViT-B backbone.

Structure mirrors infer-deepseek/src/vision/sam.rs: 16×16 conv patch
embed, absolute position embedding (antialiased-bicubic-resized to the
token grid when shapes differ), 12 pre-LN blocks — windowed 14×14
attention except global layers — with decomposed relative position bias
and erf-GELU MLPs, then a neck (1×1 conv → LN2d → 3×3 conv → LN2d) and
two stride-2 downsample convs (net_2/net_3).

TPU notes: window partition/unpartition are pure reshapes with static
pad; the decomposed rel-pos bias is computed as two einsums (the
reference uses a scalar host loop, sam.rs:1124-1196). Projections and
MLPs run in the weight dtype (bf16 by default — see
config.vision_compute_dtype; the reference upcasts the whole tower to
f32 instead, model/mod.rs:74-80) while attention scores/softmax, norms,
and the residual stream stay f32 like the reference (sam.rs:838-840).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SamParams


# -- params ----------------------------------------------------------------------


def init_sam_params(p: SamParams, key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 8 + 8 * p.depth))
    E = p.embed_dim

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i**-0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    def conv(k, i, o, ksize):
        fan_in = i * ksize * ksize
        return (jax.random.normal(k, (o, i, ksize, ksize)) * (fan_in**-0.5)).astype(
            dtype
        )

    hidden_mlp = int(E * p.mlp_ratio)
    params = {
        "patch_embed": {
            "w": conv(next(keys), 3, E, p.patch_size),
            "b": jnp.zeros((E,), dtype),
        },
        "pos_embed": (
            jax.random.normal(next(keys), (1, p.base_grid, p.base_grid, E)) * 0.02
        ).astype(dtype),
        "neck": {
            "conv1": conv(next(keys), E, p.neck_channels, 1),
            "norm1": {"w": jnp.ones((p.neck_channels,), dtype), "b": jnp.zeros((p.neck_channels,), dtype)},
            "conv2": conv(next(keys), p.neck_channels, p.neck_channels, 3),
            "norm2": {"w": jnp.ones((p.neck_channels,), dtype), "b": jnp.zeros((p.neck_channels,), dtype)},
        },
        "net_2": conv(next(keys), p.neck_channels, p.out_channels[0], 3),
        "net_3": conv(next(keys), p.out_channels[0], p.out_channels[1], 3),
        "blocks": [],
    }
    for idx in range(p.depth):
        window = 0 if idx in p.global_attn_indexes else p.window_size
        tokens = window if window > 0 else p.base_grid
        rel_dim = 2 * tokens - 1
        params["blocks"].append(
            {
                "norm1": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
                "norm2": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
                "qkv": lin(next(keys), E, 3 * E),
                "proj": lin(next(keys), E, E),
                "rel_pos_h": (
                    jax.random.normal(next(keys), (rel_dim, p.head_dim)) * 0.02
                ).astype(dtype),
                "rel_pos_w": (
                    jax.random.normal(next(keys), (rel_dim, p.head_dim)) * 0.02
                ).astype(dtype),
                "fc1": lin(next(keys), E, hidden_mlp),
                "fc2": lin(next(keys), hidden_mlp, E),
            }
        )
    return params


# -- primitives -------------------------------------------------------------------


def _conv2d(x, w, b=None, stride=1, padding=0):
    # Convs run in the weight dtype with f32 accumulation (like _linear):
    # the f32-everywhere variant measured ~2x slower on v5e (the MXU
    # multiplies in bf16 either way; f32 operands just double HBM traffic).
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None, None]
    return out


def _patch_embed(x, w, b, patch: int):
    """Patch-embed conv as reshape+matmul: a stride-p pxp conv is a dense
    [c*p*p -> E] matmul per tile, which maps onto the MXU directly (the
    NCHW conv form measured ~4 ms per 4-view batch at 1024px vs ~0.1 ms
    as a matmul). Returns NHWC tokens [B, H/p, W/p, E]."""
    bsz, c, h, wd = x.shape
    gh, gw = h // patch, wd // patch
    x = x[:, :, : gh * patch, : gw * patch]
    x = x.reshape(bsz, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(bsz, gh, gw, c * patch * patch)
    wm = w.reshape(w.shape[0], -1).T  # [c*p*p, E] from OIHW
    out = jax.lax.dot_general(
        x.astype(w.dtype), wm, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out + b.astype(jnp.float32)


def _layer_norm(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * (var + eps) ** -0.5) * w.astype(jnp.float32) + b.astype(
        jnp.float32
    )


def _layer_norm_2d(x, p, eps=1e-6):
    # channels-first LN over C (ref LayerNorm2d, sam.rs:458-473)
    nhwc = x.transpose(0, 2, 3, 1)
    return _layer_norm(nhwc, p["w"], p["b"], eps).transpose(0, 3, 1, 2)


def _linear(x, p):
    # Compute in weight dtype (ref casts inputs to weight_dtype before
    # every projection, sam.rs:452/508/516) — bf16 weights → bf16 matmul
    # with f32 accumulation on the MXU, half the HBM traffic of f32.
    w = p["w"]
    out = jnp.einsum("...i,io->...o", x.astype(w.dtype), w)
    return out + p["b"].astype(out.dtype)


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] → ([B·nWin, win, win, C], padded (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window, window, c), (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """[q, k, head_dim] relative-position rows (ref sam.rs get_rel_pos_vec:
    linear align_corners=False resize when table length mismatches, then
    floor-indexed relative coordinates)."""
    max_rel = 2 * max(q_size, k_size) - 1
    L, D = rel_pos.shape
    table = rel_pos.astype(jnp.float32)
    if L != max_rel:
        scale = L / max_rel
        src = jnp.clip(
            scale * (jnp.arange(max_rel, dtype=jnp.float32) + 0.5) - 0.5, 0.0, L - 1
        )
        left = jnp.floor(src).astype(jnp.int32)
        right = jnp.minimum(left + 1, L - 1)
        frac = (src - left.astype(jnp.float32))[:, None]
        table = table[left] * (1 - frac) + table[right] * frac
    scale_q = max(k_size / q_size, 1.0)
    scale_k = max(q_size / k_size, 1.0)
    q_coords = np.arange(q_size)[:, None] * scale_q
    k_coords = np.arange(k_size)[None, :] * scale_k
    rel = (q_coords - k_coords) + (k_size - 1) * scale_k
    idx = np.clip(np.floor(rel), 0, max_rel - 1).astype(np.int32)
    return table[jnp.asarray(idx)]


def rel_pos_bias(
    q: jnp.ndarray,  # [B, heads, S, D] with S = qh*qw
    spatial: Tuple[int, int],
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
) -> jnp.ndarray:
    """Decomposed relative bias [B, heads, S, S] (einsum form of the
    reference's compute_relative_bias, sam.rs:1124-1196)."""
    qh, qw = spatial
    b, heads, _, d = q.shape
    rh = get_rel_pos(qh, qh, rel_pos_h)  # [qh, kh, D]
    rw = get_rel_pos(qw, qw, rel_pos_w)  # [qw, kw, D]
    q_r = q.astype(jnp.float32).reshape(b, heads, qh, qw, d)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh)  # [B,H,qh,qw,kh]
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw)  # [B,H,qh,qw,kw]
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # [B,H,qh,qw,kh,kw]
    return bias.reshape(b, heads, qh * qw, qh * qw)


_TPU_BACKEND = None
# minimum token count for the Pallas global-attention kernel (S below
# this uses the XLA einsum path — also the CPU/test path)
_FLASH_MIN_S = 1024


def _on_tpu() -> bool:
    global _TPU_BACKEND
    if _TPU_BACKEND is None:
        _TPU_BACKEND = any(d.platform == "tpu" for d in jax.devices())
    return _TPU_BACKEND


def _flash_attention_ctx(q, k, v, blk, spatial):
    """Global-attention context via the Pallas kernel — the decomposed
    bias is reconstructed tile-wise in VMEM so no [S, S] tensor ever
    reaches HBM (ops/pallas/sam_attention.py)."""
    from ...ops.pallas.sam_attention import sam_flash_attention

    qh, qw = spatial
    b, n, s, d = q.shape
    rh = get_rel_pos(qh, qh, blk["rel_pos_h"])  # [qh, kh, D]
    rw = get_rel_pos(qw, qw, blk["rel_pos_w"])  # [qw, kw, D]
    q_r = q.reshape(b, n, qh, qw, d)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh).reshape(b * n, s, qh)
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw).reshape(b * n, s, qw)
    out = sam_flash_attention(
        (q * (d**-0.5)).reshape(b * n, s, d),
        k.reshape(b * n, s, d),
        v.reshape(b * n, s, d),
        bias_h,
        bias_w,
        width=qw,
    )
    return out.reshape(b, n, s, d)


def _sam_attention(x, blk, num_heads, head_dim, spatial):
    b, h, w, _ = x.shape
    s = h * w
    qkv = _linear(x, blk["qkv"]).reshape(b, s, 3, num_heads, head_dim)
    # attention math in f32 like the reference (sam.rs:838-840 casts
    # q/k/v to F32 even when projections ran in bf16)
    q, k, v = (
        qkv[:, :, i].transpose(0, 2, 1, 3).astype(jnp.float32) for i in range(3)
    )
    if s >= _FLASH_MIN_S and _on_tpu():
        ctx = _flash_attention_ctx(q, k, v, blk, spatial)
    else:
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k) * (head_dim**-0.5)
        scores = scores + rel_pos_bias(
            q, spatial, blk["rel_pos_h"], blk["rel_pos_w"]
        )
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, h, w, num_heads * head_dim)
    return _linear(ctx, blk["proj"])


def sam_forward(params: Dict, p: SamParams, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] → [B, out_channels[1], H/64, W/64] feature map."""
    x = _patch_embed(
        pixels, params["patch_embed"]["w"], params["patch_embed"]["b"],
        p.patch_size,
    )  # [B, h, w, E] NHWC tokens
    b, th, tw, e = x.shape

    pos = params["pos_embed"].astype(jnp.float32)
    if pos.shape[1] != th or pos.shape[2] != tw:
        pos = jax.image.resize(pos, (1, th, tw, e), method="bicubic", antialias=True)
    x = x + pos

    for idx, blk in enumerate(params["blocks"]):
        window = 0 if idx in p.global_attn_indexes else p.window_size
        normed = _layer_norm(x, blk["norm1"]["w"], blk["norm1"]["b"], p.norm_eps)
        if window > 0:
            windows, pad_hw = window_partition(normed, window)
            attn = _sam_attention(
                windows, blk, p.num_heads, p.head_dim, (window, window)
            )
            attn = window_unpartition(attn, window, pad_hw, (th, tw))
        else:
            attn = _sam_attention(normed, blk, p.num_heads, p.head_dim, (th, tw))
        x = x + attn
        normed = _layer_norm(x, blk["norm2"]["w"], blk["norm2"]["b"], p.norm_eps)
        h1 = jax.nn.gelu(_linear(normed, blk["fc1"]), approximate=False)
        x = x + _linear(h1, blk["fc2"])

    x = x.transpose(0, 3, 1, 2)  # NCHW
    x = _conv2d(x, params["neck"]["conv1"])
    x = _layer_norm_2d(x, params["neck"]["norm1"], p.norm_eps)
    x = _conv2d(x, params["neck"]["conv2"], padding=1)
    x = _layer_norm_2d(x, params["neck"]["norm2"], p.norm_eps)
    x = _conv2d(x, params["net_2"], stride=2, padding=1)
    x = _conv2d(x, params["net_3"], stride=2, padding=1)
    return x
