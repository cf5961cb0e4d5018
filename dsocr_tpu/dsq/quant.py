"""ggml-block quantization: Q8_0, Q4_K, Q6_K.

Faithful NumPy implementations of the ggml reference quantizers the
reference uses via candle (crates/dsq-writer/src/lib.rs:555-660 →
candle's BlockQ4K/BlockQ6K `from_float`): identical block layouts,
identical scale searches (make_qx_quants rmse_type=1 for Q6_K,
make_qkx2_quants for Q4_K), identical ties-to-even `nearest_int`
rounding, so payload bytes match and published snapshots dequantize
bit-for-bit.

Block layouts (little-endian):
- Q8_0: 32 values → f16 scale + 32×i8 (34 B)
- Q4_K: 256 values → f16 d + f16 dmin + 12 B packed 6-bit scales/mins
        (8 sub-blocks of 32) + 128 B packed 4-bit codes (144 B)
- Q6_K: 256 values → 128 B ql + 64 B qh + 16×i8 scales + f16 d (210 B)
"""

from __future__ import annotations

import numpy as np

Q8_BLOCK = 32
QK_K = 256
Q8_BLOCK_BYTES = 34
Q4K_BLOCK_BYTES = 144
Q6K_BLOCK_BYTES = 210
GROUP_MAX_EPS = 1e-15


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml nearest_int == round-half-to-even."""
    return np.rint(x).astype(np.int32)


def _f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8)


# ---------------------------------------------------------------------------
# Q8_0
# ---------------------------------------------------------------------------


def quantize_q8_0(weights: np.ndarray, rows: int, cols: int) -> bytes:
    """Row-major [rows, cols] f32 → Q8_0 payload
    (ref dsq-writer/src/lib.rs:555-598: amax/127 scale, zero-block
    shortcut, round-clamp to [-128, 127])."""
    if cols % Q8_BLOCK:
        raise ValueError(f"cols {cols} not a multiple of {Q8_BLOCK}")
    x = np.asarray(weights, np.float32).reshape(rows * cols // Q8_BLOCK, Q8_BLOCK)
    amax = np.abs(x).max(axis=1)
    scale = np.where(amax > 0.0, amax / 127.0, 0.0).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(scale != 0.0, 1.0 / np.where(scale == 0.0, 1.0, scale), 0.0)
    # Reference uses Rust f32::round = ties away from zero (dsq-writer
    # lib.rs:592), NOT numpy's ties-to-even — exact .5 values differ.
    t = x * inv[:, None]
    q = np.clip(
        np.where(t >= 0.0, np.floor(t + 0.5), np.ceil(t - 0.5)), -128, 127
    ).astype(np.int8)
    q = np.where(scale[:, None] == 0.0, np.int8(0), q)
    out = np.empty((x.shape[0], Q8_BLOCK_BYTES), np.uint8)
    out[:, :2] = _f16_bytes(scale).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_0(payload: bytes, rows: int, cols: int) -> np.ndarray:
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, Q8_BLOCK_BYTES)
    scale = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    q = blocks[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * scale).reshape(rows, cols)


# ---------------------------------------------------------------------------
# Q6_K
# ---------------------------------------------------------------------------


def _make_qx_quants(x: np.ndarray, nmax: int):
    """Vectorized ggml make_qx_quants (rmse_type=1, weight = x²) over
    [S, n] sub-blocks. Returns (L [S, n] int, scale [S] f32)."""
    S, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(S), amax_idx]
    amax = np.abs(maxv)
    dead = amax < GROUP_MAX_EPS

    w = x * x

    def trial(iscale):
        l = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        lf = l.astype(np.float32)
        sumlx = (w * x * lf).sum(axis=1)
        suml2 = (w * lf * lf).sum(axis=1)
        return l, sumlx, suml2

    safe_max = np.where(dead, 1.0, maxv)
    iscale0 = -nmax / safe_max
    L, sumlx, suml2 = trial(iscale0)
    scale = np.where(suml2 != 0.0, sumlx / np.where(suml2 == 0, 1, suml2), 0.0)
    best = scale * sumlx
    for step in range(-9, 10):
        if step == 0:
            continue
        iscale = -(nmax + 0.1 * step) / safe_max
        l, slx, sl2 = trial(iscale)
        improve = (sl2 > 0) & (slx * slx > best * sl2)
        L = np.where(improve[:, None], l, L)
        new_scale = slx / np.where(sl2 == 0, 1, sl2)
        scale = np.where(improve, new_scale, scale)
        best = np.where(improve, new_scale * slx, best)
    L = np.where(dead[:, None], 0, L)
    scale = np.where(dead, 0.0, scale)
    return L, scale.astype(np.float32)


def quantize_q6_k(weights: np.ndarray, rows: int, cols: int) -> bytes:
    if cols % QK_K:
        raise ValueError(f"cols {cols} not a multiple of {QK_K}")
    x = np.asarray(weights, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    sub = x.reshape(nb, 16, 16)

    L0, scales = _make_qx_quants(sub.reshape(nb * 16, 16), 32)
    L0 = (L0 + 32).reshape(nb, 16, 16)  # make_qx stores l + nmax
    scales = scales.reshape(nb, 16)
    abs_scales = np.abs(scales)
    max_idx = np.argmax(abs_scales, axis=1)
    max_scale = scales[np.arange(nb), max_idx]
    max_abs = abs_scales[np.arange(nb), max_idx]
    dead = max_abs < GROUP_MAX_EPS

    iscale = np.where(dead, 0.0, -128.0 / np.where(dead, 1.0, max_scale))
    d = (1.0 / np.where(iscale == 0, 1, iscale)).astype(np.float16)
    d = np.where(dead, np.float16(0), d)
    q_scales = np.minimum(127, _nearest_int(iscale[:, None] * scales)).astype(np.int8)

    dd = d.astype(np.float32)[:, None] * q_scales.astype(np.float32)  # [nb, 16]
    safe_dd = np.where(dd == 0.0, 1.0, dd)
    l = np.clip(_nearest_int(sub / safe_dd[:, :, None]), -32, 31) + 32
    # ggml's requantize pass skips dd==0 sub-blocks, leaving the
    # make_qx_quants codes in place (they decode to 0 either way).
    l = np.where((dd == 0.0)[:, :, None], L0, l)  # [nb, 16, 16] in 0..63
    Lf = l.reshape(nb, QK_K).astype(np.uint8)
    # dead blocks are fully zeroed (memset) in ggml:
    Lf = np.where(dead[:, None], np.uint8(0), Lf)

    ql = np.zeros((nb, 128), np.uint8)
    qh = np.zeros((nb, 64), np.uint8)
    for half in range(2):
        base = half * 128
        seg = Lf[:, base : base + 128]
        a0, a1, a2, a3 = seg[:, 0:32], seg[:, 32:64], seg[:, 64:96], seg[:, 96:128]
        ql[:, half * 64 + 0 : half * 64 + 32] = (a0 & 0xF) | ((a2 & 0xF) << 4)
        ql[:, half * 64 + 32 : half * 64 + 64] = (a1 & 0xF) | ((a3 & 0xF) << 4)
        qh[:, half * 32 : half * 32 + 32] = (
            (a0 >> 4) | ((a1 >> 4) << 2) | ((a2 >> 4) << 4) | ((a3 >> 4) << 6)
        )
    q_scales = np.where(dead[:, None], np.int8(0), q_scales)

    out = np.empty((nb, Q6K_BLOCK_BYTES), np.uint8)
    out[:, :128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = q_scales.view(np.uint8)
    out[:, 208:210] = _f16_bytes(d.reshape(-1)).reshape(-1, 2)
    return out.tobytes()


def dequantize_q6_k(payload: bytes, rows: int, cols: int) -> np.ndarray:
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, Q6K_BLOCK_BYTES)
    nb = blocks.shape[0]
    ql = blocks[:, :128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32).reshape(nb)

    L = np.zeros((nb, QK_K), np.int32)
    for half in range(2):
        base = half * 128
        lo0 = ql[:, half * 64 + 0 : half * 64 + 32]
        lo1 = ql[:, half * 64 + 32 : half * 64 + 64]
        hi = qh[:, half * 32 : half * 32 + 32]
        L[:, base + 0 : base + 32] = (lo0 & 0xF) | ((hi & 0x3) << 4)
        L[:, base + 32 : base + 64] = (lo1 & 0xF) | (((hi >> 2) & 0x3) << 4)
        L[:, base + 64 : base + 96] = (lo0 >> 4) | (((hi >> 4) & 0x3) << 4)
        L[:, base + 96 : base + 128] = (lo1 >> 4) | (((hi >> 6) & 0x3) << 4)
    q = (L - 32).astype(np.float32).reshape(nb, 16, 16)
    vals = d[:, None, None] * scales[:, :, None] * q
    return vals.reshape(-1)[: rows * cols].reshape(rows, cols)


# ---------------------------------------------------------------------------
# Q4_K
# ---------------------------------------------------------------------------


def _make_qkx2_quants(
    x: np.ndarray,  # [S, n]
    weights: np.ndarray,  # [S, n]
    nmax: int,
    rmin: float = -1.0,
    rdelta: float = 0.1,
    nstep: int = 20,
):
    """Vectorized ggml make_qkx2_quants (use_mad=False).
    Returns (L [S,n] uint8, scale [S], the_min [S])."""
    S, n = x.shape
    vmin = np.minimum(x.min(axis=1), 0.0)
    vmax = x.max(axis=1)
    sum_w = weights.sum(axis=1)
    sum_x = (weights * x).sum(axis=1)
    flat = vmax == vmin

    span0 = np.where(flat, 1.0, vmax - vmin)
    iscale = nmax / span0
    scale = 1.0 / iscale
    L = np.clip(_nearest_int(iscale[:, None] * (x - vmin[:, None])), 0, nmax)
    diff = scale[:, None] * L + vmin[:, None] - x
    best_mad = (weights * diff * diff).sum(axis=1)
    # ggml updates `min` on improvement INSIDE the step loop, so later
    # candidates quantize against the refined min.
    cur_min = vmin.copy()

    for step in range(nstep + 1):
        span = np.where(flat, 1.0, vmax - cur_min)
        isc = (rmin + rdelta * step + nmax) / span
        laux = np.clip(_nearest_int(isc[:, None] * (x - cur_min[:, None])), 0, nmax)
        lf = laux.astype(np.float32)
        sum_l = (weights * lf).sum(axis=1)
        sum_l2 = (weights * lf * lf).sum(axis=1)
        sum_xl = (weights * lf * x).sum(axis=1)
        D = sum_w * sum_l2 - sum_l * sum_l
        with np.errstate(divide="ignore", invalid="ignore"):
            this_scale = (sum_w * sum_xl - sum_x * sum_l) / D
            this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D
        pos_min = this_min > 0
        this_min = np.where(pos_min, 0.0, this_min)
        alt_scale = np.where(sum_l2 != 0, sum_xl / np.where(sum_l2 == 0, 1, sum_l2), 0.0)
        this_scale = np.where(pos_min, alt_scale, this_scale)
        diff = this_scale[:, None] * lf + this_min[:, None] - x
        mad = (weights * diff * diff).sum(axis=1)
        improve = (D > 0) & (mad < best_mad)
        L = np.where(improve[:, None], laux, L)
        best_mad = np.where(improve, mad, best_mad)
        scale = np.where(improve, this_scale, scale)
        cur_min = np.where(improve, this_min, cur_min)

    L = np.where(flat[:, None], 0, L).astype(np.uint8)
    scale = np.where(flat, 0.0, scale)
    the_min = np.where(flat, -vmin, -cur_min)
    return L, scale.astype(np.float32), the_min.astype(np.float32)


def _pack_q4k_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """[nb, 8] 6-bit scales + [nb, 8] 6-bit mins → [nb, 12] packed bytes."""
    nb = ls.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    for j in range(8):
        if j < 4:
            out[:, j] |= ls[:, j] & 63
            out[:, j + 4] |= lm[:, j] & 63
        else:
            out[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
            out[:, j - 4] |= (ls[:, j] >> 4) << 6
            out[:, j] |= (lm[:, j] >> 4) << 6
    return out


def _unpack_q4k_scales(packed: np.ndarray):
    """[nb, 12] → (sc [nb, 8], m [nb, 8]) (ggml get_scale_min_k4)."""
    sc = np.zeros((packed.shape[0], 8), np.int32)
    m = np.zeros_like(sc)
    for j in range(8):
        if j < 4:
            sc[:, j] = packed[:, j] & 63
            m[:, j] = packed[:, j + 4] & 63
        else:
            sc[:, j] = (packed[:, j + 4] & 0xF) | ((packed[:, j - 4] >> 6) << 4)
            m[:, j] = (packed[:, j + 4] >> 4) | ((packed[:, j] >> 6) << 4)
    return sc, m


def quantize_q4_k(weights_in: np.ndarray, rows: int, cols: int) -> bytes:
    if cols % QK_K:
        raise ValueError(f"cols {cols} not a multiple of {QK_K}")
    x = np.asarray(weights_in, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    sub = x.reshape(nb * 8, 32)
    av_x = np.sqrt((sub * sub).sum(axis=1) / 32.0)
    w = av_x[:, None] + np.abs(sub)
    _, scales, mins = _make_qkx2_quants(sub, w, 15)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale <= 0, 1, max_scale), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min <= 0, 1, max_min), 0.0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_q4k_scales(ls, lm)
    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_min / 63.0).astype(np.float16)

    sc, mm = _unpack_q4k_scales(packed_scales)
    dd = d.astype(np.float32)[:, None] * sc  # [nb, 8]
    mmf = dmin.astype(np.float32)[:, None] * mm
    sub_b = x.reshape(nb, 8, 32)
    safe_dd = np.where(dd == 0.0, 1.0, dd)
    L = np.clip(
        _nearest_int((sub_b + mmf[:, :, None]) / safe_dd[:, :, None]), 0, 15
    )
    L = np.where((dd == 0.0)[:, :, None], 0, L).reshape(nb, QK_K).astype(np.uint8)

    qs = np.zeros((nb, 128), np.uint8)
    for j in range(0, QK_K, 64):
        seg_lo = L[:, j : j + 32]
        seg_hi = L[:, j + 32 : j + 64]
        qs[:, j // 2 : j // 2 + 32] = seg_lo | (seg_hi << 4)

    out = np.empty((nb, Q4K_BLOCK_BYTES), np.uint8)
    out[:, 0:2] = _f16_bytes(d.reshape(-1)).reshape(-1, 2)
    out[:, 2:4] = _f16_bytes(dmin.reshape(-1)).reshape(-1, 2)
    out[:, 4:16] = packed_scales
    out[:, 16:144] = qs
    return out.tobytes()


def dequantize_q4_k(payload: bytes, rows: int, cols: int) -> np.ndarray:
    blocks = np.frombuffer(payload, np.uint8).reshape(-1, Q4K_BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc, m = _unpack_q4k_scales(blocks[:, 4:16])
    qs = blocks[:, 16:144]
    L = np.zeros((nb, QK_K), np.int32)
    for j in range(0, QK_K, 64):
        seg = qs[:, j // 2 : j // 2 + 32]
        L[:, j : j + 32] = seg & 0xF
        L[:, j + 32 : j + 64] = seg >> 4
    dd = d[:, None] * sc  # [nb, 8]
    mm = dmin[:, None] * m
    vals = dd[:, :, None] * L.reshape(nb, 8, 32) - mm[:, :, None]
    return vals.reshape(-1)[: rows * cols].reshape(rows, cols)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_QUANTIZERS = {
    "Q8_0": (quantize_q8_0, dequantize_q8_0, Q8_BLOCK),
    "Q4_K": (quantize_q4_k, dequantize_q4_k, QK_K),
    "Q6_K": (quantize_q6_k, dequantize_q6_k, QK_K),
}


def quantize(dtype: str, weights: np.ndarray, rows: int, cols: int) -> bytes:
    """Native C++ kernel when available (byte-identical, ~10x — the
    NumPy k-quant scale searches allocate dozens of temporaries);
    DSOCR_NO_NATIVE=1 forces the NumPy path."""
    import os

    if os.environ.get("DSOCR_NO_NATIVE") != "1":
        from ..native import quantize_native

        payload = quantize_native(dtype.lower(), weights, rows, cols)
        if payload is not None:
            return payload
    return _QUANTIZERS[dtype][0](weights, rows, cols)


def dequantize(dtype: str, payload: bytes, rows: int, cols: int) -> np.ndarray:
    return _QUANTIZERS[dtype][1](payload, rows, cols)


def block_size(dtype: str) -> int:
    return _QUANTIZERS[dtype][2]
