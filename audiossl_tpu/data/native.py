"""ctypes bindings for the native batch WAV loader (_native/wavloader.cpp).

Compiles the shared library on first use (g++, cached next to the source);
falls back gracefully to the NumPy decode path when a toolchain is missing.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("audiossl_tpu.native")

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_SRC_DIR, "wavloader.cpp")
_SO = os.path.join(_SRC_DIR, "libwavloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / sandboxed build dir
        log.info("native wavloader build failed (%s); using NumPy decode path", e)
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.info("native wavloader load failed: %s", e)
            return None
        lib.avl_decode.restype = ctypes.c_int
        lib.avl_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.avl_load_batch.restype = ctypes.c_int
        lib.avl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_ulonglong, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.avl_load_batch2.restype = ctypes.c_int
        lib.avl_load_batch2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_ulonglong, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_batch(
    paths: list[str], clip_samples: int, target_sr: int = 16000, seed: int = 0,
    n_threads: int = 8, on_error: str = "raise",
    offsets: list[int] | None = None, lengths: list[int] | None = None,
) -> np.ndarray | None:
    """Decode + window a batch natively -> [n, clip_samples] f32, or None.

    ``offsets``/``lengths`` select per-clip byte ranges (tar-shard members,
    data/tar.py; length -1 = to EOF). ``on_error='zeros'``: failed clips
    stay silence (the C++ loader zero-fills a failed row before reporting
    it — wavloader.cpp avl_load_batch2) and a warning names one failing
    file instead of raising; the production policy for web-scale corpora."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, clip_samples), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    offs = (ctypes.c_longlong * n)(*offsets) if offsets is not None else None
    lens = (ctypes.c_longlong * n)(*lengths) if lengths is not None else None
    rc = lib.avl_load_batch2(
        arr, offs, lens, n, clip_samples, target_sr,
        ctypes.c_ulonglong(seed & (2**64 - 1)), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        if on_error != "zeros":
            raise IOError(f"native loader failed on file index {-rc - 1}: {paths[-rc - 1]}")
        log.warning("bad audio file(s), substituting silence (e.g. %s)", paths[-rc - 1])
    return out


def decode(path: str, target_sr: int = 16000, max_seconds: float = 600.0) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    cap = int(max_seconds * target_sr)
    out = np.empty(cap, np.float32)
    n = lib.avl_decode(path.encode(), target_sr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    if n < 0:
        raise IOError(f"native decode failed ({n}) for {path}")
    return out[:n].copy()
