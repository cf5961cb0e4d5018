"""Pillow-exact bicubic resampling.

The reference re-implements Pillow's 8bpc fixed-point convolution
resampler in Rust (infer-deepseek/src/vision/resample.rs:9-160) because
one pixel of drift changes vision tokens and therefore all generated
text. We have the genuine article — Pillow — in-process, so the default
backend simply calls ``PIL.Image.resize(..., BICUBIC)``, which is
bit-exact by construction.

``resize_bicubic_numpy`` is an independent NumPy implementation of the
same 22-bit fixed-point algorithm (support=2 bicubic, a=-0.5,
round-half-towards-zero bounds, per-row coefficient normalization,
``(acc + 2^21) >> 22`` clip8). It is golden-tested against Pillow and
serves environments without Pillow plus as the spec for the C++ batched
resampler.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

_PRECISION_BITS = 22
_PRECISION_SCALE = float(1 << _PRECISION_BITS)
_ROUNDING_BIAS = 1 << (_PRECISION_BITS - 1)


def resize_bicubic(image: np.ndarray, width: int, height: int) -> np.ndarray:
    """Resize an RGB uint8 array [H, W, 3] with Pillow's bicubic filter.

    Prefers the native C++ kernel (bit-exact vs Pillow, no PIL round
    trip); falls back to Pillow itself when the toolchain is absent."""
    if width <= 0 or height <= 0:
        return np.zeros((max(height, 0), max(width, 0), 3), dtype=np.uint8)
    from ..native import resize_bicubic_native

    out = resize_bicubic_native(image, width, height)
    if out is not None:
        return out
    pil = Image.fromarray(np.ascontiguousarray(image), mode="RGB")
    return np.asarray(pil.resize((width, height), Image.Resampling.BICUBIC))


def _bicubic_kernel(x: np.ndarray) -> np.ndarray:
    a = -0.5
    x = np.abs(x)
    inner = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    outer = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, inner, np.where(x < 2.0, outer, 0.0))


def _round_half_towards_zero(value: np.ndarray) -> np.ndarray:
    # Pillow computes bounds as the C cast `(int)(value + 0.5)`, which
    # truncates toward zero (so e.g. -0.375 → 0, not 1).
    return np.trunc(value + 0.5)


def _compute_coeffs(input_size: int, output_size: int):
    """Per-output-pixel (start, length) bounds and int32 fixed-point weights."""
    scale = input_size / output_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1

    out_idx = np.arange(output_size, dtype=np.float64)
    center = (out_idx + 0.5) * scale
    xmin = _round_half_towards_zero(center - support).astype(np.int64)
    xmin = np.maximum(xmin, 0)
    xmax = _round_half_towards_zero(center + support).astype(np.int64)
    xmax = np.minimum(xmax, input_size)
    xmin = np.where(xmin >= input_size, max(input_size - 1, 0), xmin)
    xmax = np.where(xmax <= xmin, xmin + 1, xmax)
    length = (xmax - xmin).astype(np.int64)

    ss = 1.0 / filterscale
    taps = np.arange(ksize, dtype=np.float64)
    sample_pos = xmin[:, None] + taps[None, :]
    weights = _bicubic_kernel((sample_pos - center[:, None] + 0.5) * ss)
    valid = taps[None, :] < length[:, None]
    weights = np.where(valid, weights, 0.0)
    sums = weights.sum(axis=1, keepdims=True)
    weights = np.where(sums != 0.0, weights / np.where(sums == 0.0, 1.0, sums), weights)
    scaled = weights * _PRECISION_SCALE
    coeffs_int = np.where(scaled < 0.0, scaled - 0.5, scaled + 0.5).astype(np.int32)
    coeffs_int = np.where(valid, coeffs_int, 0)
    return xmin, length, coeffs_int, ksize


def _clip8(acc: np.ndarray) -> np.ndarray:
    return np.clip(acc >> _PRECISION_BITS, 0, 255).astype(np.uint8)


def _resample_axis(data: np.ndarray, xmin, coeffs_int, ksize, input_size) -> np.ndarray:
    """Convolve the leading axis of [S, ...] uint8 data down to the
    coefficient table's output size using int64 fixed-point accumulation."""
    output_size = xmin.shape[0]
    # Gather [out, ksize, ...] windows; taps beyond `length` have zero weight
    # so clamping the index is safe.
    taps = np.arange(ksize, dtype=np.int64)
    gather = np.minimum(xmin[:, None] + taps[None, :], input_size - 1)
    windows = data[gather].astype(np.int64)  # [out, ksize, ...]
    w = coeffs_int.astype(np.int64).reshape(
        (output_size, ksize) + (1,) * (windows.ndim - 2)
    )
    acc = (windows * w).sum(axis=1) + _ROUNDING_BIAS
    return _clip8(acc)


def resize_bicubic_numpy(image: np.ndarray, width: int, height: int) -> np.ndarray:
    """NumPy fixed-point bicubic resize of RGB uint8 [H, W, 3]; bit-exact
    with Pillow (and therefore with the reference Rust resampler)."""
    if width <= 0 or height <= 0:
        return np.zeros((max(height, 0), max(width, 0), 3), dtype=np.uint8)
    src_h, src_w = image.shape[:2]

    xmin, _, coeffs_x, ksize_x = _compute_coeffs(src_w, width)
    ymin, _, coeffs_y, ksize_y = _compute_coeffs(src_h, height)

    # Horizontal pass: operate on the W axis.
    horizontal = _resample_axis(
        np.transpose(image, (1, 0, 2)), xmin, coeffs_x, ksize_x, src_w
    )  # [dst_w, src_h, 3]
    # Vertical pass: operate on the H axis.
    output = _resample_axis(
        np.transpose(horizontal, (1, 0, 2)), ymin, coeffs_y, ksize_y, src_h
    )  # [dst_h, dst_w, 3]
    return output
