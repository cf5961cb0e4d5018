"""ctypes binding for native/resample.cpp with a lazy g++ build."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SOURCE = _REPO_ROOT / "native" / "resample.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build_dir() -> pathlib.Path:
    cache = os.environ.get("DSOCR_NATIVE_CACHE")
    if cache:
        return pathlib.Path(cache)
    return pathlib.Path.home() / ".cache" / "dsocr_tpu" / "native"


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
            lib_path = build_dir / "libdsocr_resample.so"
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
            lib.resize_bicubic_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ]
            lib.resize_normalize_chw.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_float,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def native_available() -> bool:
    return _load() is not None


def resize_bicubic_native(image: np.ndarray, width: int, height: int) -> Optional[np.ndarray]:
    """Pillow-exact resize via the native kernel; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.uint8)
    sh, sw = src.shape[:2]
    dst = np.empty((height, width, 3), np.uint8)
    lib.resize_bicubic_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), height, width,
    )
    return dst


def resize_normalize_chw_native(
    image: np.ndarray,
    width: int,
    height: int,
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    rescale: float = 1.0 / 255.0,
) -> Optional[np.ndarray]:
    """Fused resize + normalize + CHW float32; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.uint8)
    sh, sw = src.shape[:2]
    dst = np.empty((3, height, width), np.float32)
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    lib.resize_normalize_chw(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(rescale),
    )
    return dst
