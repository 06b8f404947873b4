"""ctypes bindings for the native preprocessing library (native/preproc.cc).

Multithreaded C++ resize/letterbox straight into the padded float32 NHWC
batch — the rebuild's equivalent of the reference's cv2 + dataloader-worker
native host path (SURVEY.md §3.1).  Auto-builds with make on first use;
callers fall back to the pure-Python path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpreproc.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.preproc_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),                 # srcs
            ctypes.POINTER(ctypes.c_int),                    # hs
            ctypes.POINTER(ctypes.c_int),                    # ws
            ctypes.c_int,                                    # n
            ctypes.POINTER(ctypes.c_float),                  # dst
            ctypes.c_int, ctypes.c_int, ctypes.c_int,        # S, letterbox, threads
            ctypes.POINTER(ctypes.c_float),                  # scales
            ctypes.POINTER(ctypes.c_float),                  # pad_xs
            ctypes.POINTER(ctypes.c_float),                  # pad_ys
        ]
        lib.preproc_batch.restype = None
        lib.decode_preproc_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),                 # paths
            ctypes.c_int,                                    # n
            ctypes.POINTER(ctypes.c_float),                  # dst
            ctypes.c_int, ctypes.c_int, ctypes.c_int,        # S, letterbox, threads
            ctypes.POINTER(ctypes.c_int),                    # orig_ws
            ctypes.POINTER(ctypes.c_int),                    # orig_hs
            ctypes.POINTER(ctypes.c_float),                  # scales
            ctypes.POINTER(ctypes.c_float),                  # pad_xs
            ctypes.POINTER(ctypes.c_float),                  # pad_ys
            ctypes.POINTER(ctypes.c_int),                    # ok
        ]
        lib.decode_preproc_batch.restype = None
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def preproc_batch(images: List[np.ndarray], size: int, letterbox: bool,
                  threads: int = 0
                  ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]]:
    """[HWC u8 RGB, ...] -> (batch [N,S,S,3] f32 in [0,1], scales, pad_xs,
    pad_ys).  Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    srcs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    dst = np.empty((n, size, size, 3), np.float32)
    scales = np.empty((n,), np.float32)
    pad_xs = np.empty((n,), np.float32)
    pad_ys = np.empty((n,), np.float32)
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    lib.preproc_batch(
        srcs, hs, ws, n,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, int(letterbox), threads,
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst, scales, pad_xs, pad_ys


def decode_preproc_batch(paths: List[str], size: int, letterbox: bool,
                         threads: int = 0):
    """Fused JPEG decode (DCT-scaled) + resize/letterbox + normalize + pack.

    Returns (batch [N,S,S,3] f32, orig_ws, orig_hs, scales, pad_xs, pad_ys,
    ok) or None when unavailable.  scales/pads are relative to the ORIGINAL
    image frame (annotation coordinates).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "decode_preproc_batch"):
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    dst = np.empty((n, size, size, 3), np.float32)
    orig_ws = np.empty((n,), np.int32)
    orig_hs = np.empty((n,), np.int32)
    scales = np.empty((n,), np.float32)
    pad_xs = np.empty((n,), np.float32)
    pad_ys = np.empty((n,), np.float32)
    ok = np.empty((n,), np.int32)
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    i32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    f32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.decode_preproc_batch(c_paths, n, f32(dst), size, int(letterbox),
                             threads, i32(orig_ws), i32(orig_hs), f32(scales),
                             f32(pad_xs), f32(pad_ys), i32(ok))
    return dst, orig_ws, orig_hs, scales, pad_xs, pad_ys, ok
