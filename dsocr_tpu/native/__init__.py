"""Native (C++) host kernels with lazy builds and graceful fallbacks.

The reference's host-side native components (Rust resampler/codec) map
here: native/resample.cpp holds the Pillow-exact fixed-point bicubic
resampler and a fused resize+normalize+CHW kernel, built on demand with
g++ into a cached shared library and bound via ctypes. Callers fall back
to the PIL/NumPy paths when the toolchain is unavailable.
"""

from .resample import (
    native_available,
    resize_bicubic_native,
    resize_normalize_chw_native,
)
from .quant import quant_native_available, quantize_native

__all__ = [
    "native_available",
    "resize_bicubic_native",
    "resize_normalize_chw_native",
    "quant_native_available",
    "quantize_native",
]
