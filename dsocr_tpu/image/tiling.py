"""Dynamic crop tiling (aspect-ratio-matched local views).

Contract: infer-deepseek/src/vision/preprocess.rs — candidate (w, h) tile
grids enumerated in sorted order, closest aspect ratio wins, exact-tie
break prefers the larger grid when the source area exceeds half the
candidate's pixel budget; OCR1 allows 2..=9 tiles, OCR2 2..=6; images no
larger than the tile size skip cropping entirely.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional, Tuple

import numpy as np

from .resample import resize_bicubic


@dataclasses.dataclass(frozen=True)
class PreprocessParams:
    tile_size: int
    base_size: int
    min_num: int
    max_num: int
    small_image_no_crop_threshold: Optional[int] = None

    @classmethod
    def ocr1(cls, base_size: int, tile_size: int) -> "PreprocessParams":
        return cls(tile_size, base_size, 2, 9, tile_size)

    @classmethod
    def ocr2(cls, base_size: int, tile_size: int) -> "PreprocessParams":
        return cls(tile_size, base_size, 2, 6, tile_size)


@dataclasses.dataclass
class DynamicPreprocessResult:
    tiles: List[np.ndarray]
    ratio: Tuple[int, int]

    @property
    def grid(self) -> Tuple[int, int]:
        return self.ratio


def select_target_ratio(
    orig_width: int, orig_height: int, params: PreprocessParams
) -> Tuple[int, int]:
    """Pick the (w_tiles, h_tiles) grid whose aspect ratio best matches the
    source image."""
    aspect_ratio = orig_width / orig_height
    ratios = sorted(
        {
            (i, j)
            for n in range(params.min_num, params.max_num + 1)
            for i in range(1, n + 1)
            for j in range(1, n + 1)
            if params.min_num <= i * j <= params.max_num
        }
    )
    best = (1, 1)
    best_diff = float("inf")
    area = float(orig_width * orig_height)
    for w_ratio, h_ratio in ratios:
        diff = abs(aspect_ratio - w_ratio / h_ratio)
        if diff < best_diff:
            best_diff = diff
            best = (w_ratio, h_ratio)
        elif (
            abs(diff - best_diff) < sys.float_info.epsilon
            and area > 0.5 * params.tile_size * params.tile_size * w_ratio * h_ratio
        ):
            best = (w_ratio, h_ratio)
    return best


def dynamic_preprocess(
    image: np.ndarray,
    params: PreprocessParams,
    use_thumbnail: bool = False,
) -> DynamicPreprocessResult:
    """Split an RGB uint8 [H, W, 3] image into aspect-matched tile crops."""
    orig_h, orig_w = image.shape[:2]
    threshold = params.small_image_no_crop_threshold
    if threshold is not None and orig_w <= threshold and orig_h <= threshold:
        return DynamicPreprocessResult(tiles=[], ratio=(1, 1))

    target_ratio = select_target_ratio(orig_w, orig_h, params)
    target_w = params.tile_size * target_ratio[0]
    target_h = params.tile_size * target_ratio[1]
    resized = resize_bicubic(image, target_w, target_h)

    tiles: List[np.ndarray] = []
    tiles_w = target_w // params.tile_size
    tiles_h = target_h // params.tile_size
    for i in range(tiles_w * tiles_h):
        x = (i % tiles_w) * params.tile_size
        y = (i // tiles_w) * params.tile_size
        tiles.append(resized[y : y + params.tile_size, x : x + params.tile_size])

    if use_thumbnail and len(tiles) > 1:
        tiles.append(resize_bicubic(image, params.tile_size, params.tile_size))

    return DynamicPreprocessResult(tiles=tiles, ratio=target_ratio)
