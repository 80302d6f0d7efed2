"""ctypes bindings for the native (C++) asynchronous data loader.

The reference's ingest is native C++ on the tracking thread
(Examples/.../stereo_inertial_euroc.cc cv::imread per frame); ours is a
C++ worker pool decoding ahead of the tracker (native/dataloader.cpp).
Builds lazily with `make` on first use; falls back to the pure-Python
pillow path (utils/euroc.py) when the toolchain or libpng is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslamio.so")

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.loader_size.restype = ctypes.c_longlong
    lib.loader_size.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_png.restype = ctypes.c_int
    lib.decode_png.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.png_dims.restype = ctypes.c_int
    lib.png_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str) -> np.ndarray | None:
    """Synchronous single-image decode through the native library."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.png_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.decode_png(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w.value, h.value)
    return out if rc == 0 else None


class StereoPrefetcher:
    """Background-decoded stereo stream (bounded ring, n_workers threads)."""

    def __init__(self, left_paths: list[str], right_paths: list[str], width: int, height: int,
                 n_workers: int = 2, ring: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._handle = lib.loader_create(
            "\n".join(left_paths).encode(), "\n".join(right_paths).encode(), n_workers, ring
        )
        if not self._handle:
            raise RuntimeError("loader_create failed (path count mismatch?)")
        self.width = width
        self.height = height

    def __len__(self):
        return int(self._lib.loader_size(self._handle))

    def __iter__(self):
        while True:
            l = np.empty((self.height, self.width), np.float32)
            r = np.empty((self.height, self.width), np.float32)
            rc = self._lib.loader_next(
                self._handle,
                l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.width,
                self.height,
            )
            if rc == -1:
                return
            if rc != 0:
                raise RuntimeError(f"native decode failed rc={rc}")
            yield l, r

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
