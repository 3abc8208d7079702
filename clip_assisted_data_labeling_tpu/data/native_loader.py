"""ctypes bindings for the native batch JPEG decoder (native/fastloader.cpp).

Compiled on first use with the system toolchain (g++ + libjpeg, both baked into
the image) and cached; everything degrades gracefully to the cv2/PIL path when
the toolchain or library is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "fastloader.cpp")
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out,
           "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain/libjpeg — fall back silently
        log.info("native loader build failed (%s); using cv2/PIL path", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "ctpu_native",
    )
    so_path = os.path.join(cache, "fastloader.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        if not _build(src, so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        log.info("native loader unavailable (%s)", e)
        return None
    lib.decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.decode_batch.restype = None
    _LIB = lib
    return _LIB


def decode_batch_native(paths: list[str], canvas_size: int, n_threads: int = 8):
    """Decode a batch of JPEGs → (canvases [n,C,C,3] u8, dims [n,2] (w,h)).

    dims[i] == (0, 0) marks a failed decode (caller should fall back for it).
    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    canvases = np.zeros((n, canvas_size, canvas_size, 3), np.uint8)
    dims = np.zeros((n, 2), np.int32)
    # os.fsencode round-trips surrogate-escaped (non-UTF-8) filenames that a
    # plain str.encode() would raise UnicodeEncodeError on
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.decode_batch(
        arr, n, canvas_size,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    return canvases, dims
