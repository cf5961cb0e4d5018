"""ctypes binding for native/quant.cpp (ggml quantizers) with a lazy
g++ build; callers fall back to the NumPy spec when unavailable."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

from .resample import _build_dir

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SOURCE = _REPO_ROOT / "native" / "quant.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_BLOCKS = {"q8_0": (32, 34), "q4_k": (256, 144), "q6_k": (256, 210)}


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            build_dir = _build_dir()
            build_dir.mkdir(parents=True, exist_ok=True)
            lib_path = build_dir / "libdsocr_quant.so"
            # a prebuilt library without the .cpp source (wheel/container
            # installs) is valid — only rebuild when the source is present
            # and newer
            if not lib_path.exists() or (
                _SOURCE.exists()
                and lib_path.stat().st_mtime < _SOURCE.stat().st_mtime
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        str(_SOURCE), "-o", str(lib_path),
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(lib_path))
            for fn in (
                lib.quantize_q8_0_native,
                lib.quantize_q4_k_native,
                lib.quantize_q6_k_native,
            ):
                fn.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint8),
                ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def quant_native_available() -> bool:
    return _load() is not None


def quantize_native(
    method: str, weights: np.ndarray, rows: int, cols: int
) -> Optional[bytes]:
    """ggml payload bytes via the native kernel; None if unavailable.
    Byte-identical to dsq.quant's NumPy implementations (tested)."""
    lib = _load()
    if lib is None:
        return None
    block, block_bytes = _BLOCKS[method]
    if cols % block:
        raise ValueError(f"cols {cols} not a multiple of {block}")
    x = np.ascontiguousarray(weights, np.float32).reshape(rows, cols)
    n_blocks = rows * cols // block
    out = np.empty(n_blocks * block_bytes, np.uint8)
    fn = getattr(lib, f"quantize_{method}_native")
    fn(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_blocks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.tobytes()
