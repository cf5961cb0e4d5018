"""Global-view letterboxing and tensor conversion.

Contract: infer-deepseek/src/model/mod.rs:2295-2347 — mean-gray canvas,
ties-to-even scaled dimensions and centering offsets, CHW layout
normalized as (x/255 − 0.5)/0.5.
"""

from __future__ import annotations

import numpy as np

from .resample import resize_bicubic


def round_ties_to_even(value: float) -> float:
    """Round-half-to-even (banker's rounding), matching the reference's
    explicit implementation (model/mod.rs:2295-2306)."""
    rounded = np.floor(value + 0.5) if value >= 0 else np.ceil(value - 0.5)
    if abs(value - rounded) != 0.5:
        return float(rounded)
    truncated = float(np.trunc(value))
    if int(truncated) % 2 == 0:
        return truncated
    return truncated + float(np.sign(value) if value != 0 else 1.0)


def build_global_view(image: np.ndarray, base_size: int) -> np.ndarray:
    """Letterbox an RGB uint8 [H, W, 3] image onto a mean-gray
    base_size×base_size canvas, preserving aspect ratio."""
    return build_global_view_with_box(image, base_size)[0]


def build_global_view_with_box(
    image: np.ndarray, base_size: int
) -> "tuple[np.ndarray, tuple[int, int, int, int]]":
    """Like :func:`build_global_view`, additionally returning the content
    box as CONSTANT-127 margins ``(top, bottom, left, right)``: everything
    outside the box is the mean-gray fill, so the canvas can be rebuilt
    exactly from the content slice + a constant pad (the serving path
    ships only the content over the host↔device link)."""
    mean = int(0.5 * 255.0)  # 127
    canvas = np.full((base_size, base_size, 3), mean, dtype=np.uint8)
    if image.size == 0:
        return canvas, (0, 0, 0, 0)
    orig_h, orig_w = image.shape[:2]
    if orig_w == 0 or orig_h == 0:
        return canvas, (0, 0, 0, 0)
    scale = min(base_size / orig_w, base_size / orig_h)
    new_w = int(min(max(round_ties_to_even(orig_w * scale), 1.0), float(base_size)))
    new_h = int(min(max(round_ties_to_even(orig_h * scale), 1.0), float(base_size)))
    resized = resize_bicubic(image, new_w, new_h)
    x_off = int(round_ties_to_even((base_size - new_w) * 0.5))
    y_off = int(round_ties_to_even((base_size - new_h) * 0.5))
    canvas[y_off : y_off + new_h, x_off : x_off + new_w] = resized
    box = (y_off, base_size - new_h - y_off, x_off, base_size - new_w - x_off)
    return canvas, box


def image_to_tensor(image: np.ndarray) -> np.ndarray:
    """RGB uint8 [H, W, 3] → float32 CHW [3, H, W], (x/255 − 0.5)/0.5."""
    chw = np.transpose(image, (2, 0, 1)).astype(np.float32)
    return (chw / 255.0 - 0.5) / 0.5
