"""Host-side image preprocessing: Pillow-exact bicubic resampling,
letterboxed global views, dynamic crop tiling, Qwen2-VL-style smart
resize + patchify.

These run on the host (bit-exactness gates token parity — SURVEY.md §7.3
item 2); the resulting pixel tensors are shipped to the TPU in one
transfer. Contract sources: infer-deepseek/src/vision/{resample,preprocess}.rs,
infer-deepseek/src/model/mod.rs:2295-2347, and
infer-paddleocr/src/vision/preprocess.rs.
"""

from .resample import resize_bicubic, resize_bicubic_numpy
from .ops import (
    build_global_view,
    build_global_view_with_box,
    image_to_tensor,
    round_ties_to_even,
)
from .tiling import PreprocessParams, DynamicPreprocessResult, dynamic_preprocess
from .smart_resize import (
    SmartResizeConfig,
    ImagePatches,
    smart_resize,
    preprocess_patches,
)
from .sparse_code import SparseViews, encode_views, decode_views

__all__ = [
    "resize_bicubic",
    "resize_bicubic_numpy",
    "build_global_view",
    "build_global_view_with_box",
    "image_to_tensor",
    "round_ties_to_even",
    "PreprocessParams",
    "DynamicPreprocessResult",
    "dynamic_preprocess",
    "SmartResizeConfig",
    "ImagePatches",
    "smart_resize",
    "preprocess_patches",
    "SparseViews",
    "encode_views",
    "decode_views",
]
