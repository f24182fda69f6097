"""Native (C++) host-side runtime: threaded JPEG decode + letterbox.

Builds ``pfr_native.cpp`` (libjpeg + std::thread) into a shared library on first
use and exposes it through ctypes. This is the TPU build's native data-loader
component (SURVEY.md §2.10: the reference delegates image decode to PIL/libjpeg
inside torch DataLoader workers; here it is a first-class batch API that writes
directly into the pinned NHWC host tensor the device upload consumes).

Falls back gracefully: ``is_available()`` is False when no compiler/libjpeg
exists, and callers keep the PIL path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "pfr_native.cpp"
_LIB_PATH = _HERE / "libpfr_native.so"
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH), "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not _LIB_PATH.exists() or (
                _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            ):
                _build()
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.pfr_decode_batch.restype = ctypes.c_int
            lib.pfr_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.pfr_decode_single.restype = ctypes.c_int
            lib.pfr_decode_single.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - no toolchain
            _build_error = str(e)
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_batch(
    paths: list[str | Path],
    out_size: tuple[int, int],
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode + letterbox a batch of JPEGs on the native thread pool.

    Returns ``(images (N, H, W, 3) uint8, ok (N,) bool, scales (N,),
    pads (N, 2))`` with the same geometry as ``utils.collate.letterbox_image``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"pfr_native unavailable: {_build_error}")
    H, W = out_size
    n = len(paths)
    images = np.zeros((n, H, W, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    scales = np.zeros(n, np.float32)
    pads = np.zeros((n, 2), np.float32)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    lib.pfr_decode_batch(
        c_paths, n,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), W, H,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return images, ok.astype(bool), scales, pads


def decode_single(path: str | Path, target_min_side: int = 0) -> np.ndarray | None:
    """Decode one JPEG to an (H, W, 3) uint8 array (None on failure)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"pfr_native unavailable: {_build_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.pfr_decode_single(str(path).encode(), None,
                                 ctypes.byref(w), ctypes.byref(h),
                                 target_min_side):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    lib.pfr_decode_single(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(w), ctypes.byref(h), target_min_side,
    )
    return out
