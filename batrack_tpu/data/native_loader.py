"""ctypes bindings for the native C++ data runtime (native/src/dataio.cpp).

Provides libpng/libjpeg decoding, Sintel .dpt/.cam and .npy readers, and a
multi-threaded prefetch loader that decodes + crops + clips frames ahead of
the SLAM loop and delivers them in order. Builds the shared library on first
use (make in native/); everything degrades gracefully to the pure-Python
readers when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbatrack_dataio.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.btk_loader_create.restype = ctypes.c_void_p
    lib.btk_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.btk_loader_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    lib.btk_loader_next.restype = ctypes.c_int
    lib.btk_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p
    ]
    lib.btk_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_dpt(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    H = ctypes.c_int()
    W = ctypes.c_int()
    rc = lib.btk_read_dpt(path.encode(), None, ctypes.byref(H), ctypes.byref(W))
    if rc != 0:
        raise IOError(f"bad .dpt file {path}")
    out = np.empty((H.value, W.value), np.float32)
    lib.btk_read_dpt(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(H), ctypes.byref(W),
    )
    return out


def read_cam(path: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    K = np.empty(9, np.float64)
    E = np.empty(12, np.float64)
    rc = lib.btk_read_cam(
        path.encode(),
        K.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        E.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(f"bad .cam file {path}")
    return K.reshape(3, 3), E.reshape(3, 4)


def read_image(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    H = ctypes.c_int()
    W = ctypes.c_int()
    rc = lib.btk_read_image(path.encode(), None, ctypes.byref(H), ctypes.byref(W))
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    out = np.empty((H.value, W.value, 3), np.uint8)
    lib.btk_read_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(H), ctypes.byref(W),
    )
    return out


class PrefetchLoader:
    """Threaded RGB-D prefetcher delivering (idx, image u8, depth f32) in order.

    image paths: .png/.jpg; depth paths: .npy (f32/f64) or Sintel .dpt.
    Frames are cropped to multiples of 16 and depth is clipped to
    [dmin, dmax] (run_batrack.py:58 semantics) off the critical path.
    """

    def __init__(
        self,
        image_paths: Sequence[str],
        depth_paths: Sequence[str],
        num_threads: int = 3,
        queue_cap: int = 8,
        dmin: float = 1e-2,
        dmax: float = 1e2,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native dataio library unavailable")
        self._lib = lib
        n = len(image_paths)
        img_arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in image_paths])
        dep_arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in depth_paths])
        self._h = lib.btk_loader_create(
            img_arr, dep_arr, n, num_threads, queue_cap,
            ctypes.c_float(dmin), ctypes.c_float(dmax),
        )
        H = ctypes.c_int()
        W = ctypes.c_int()
        lib.btk_loader_dims(self._h, ctypes.byref(H), ctypes.byref(W))
        self.shape = (H.value, W.value)
        self.n = n

    def __iter__(self):
        H, W = self.shape
        for _ in range(self.n):
            img = np.empty((H, W, 3), np.uint8)
            depth = np.empty((H, W), np.float32)
            idx = self._lib.btk_loader_next(
                self._h, img.ctypes.data, depth.ctypes.data
            )
            if idx < 0:
                raise IOError(f"native loader failed at frame (code {idx})")
            yield idx, img, depth

    def close(self):
        if self._h:
            self._lib.btk_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
