"""ctypes bindings + on-demand build of the native data-loading core.

The reference's data path runs in torch DataLoader worker processes (PIL
decode per sample); here a C++ library (``native/madm_data.cpp``) does
decode/resample/crop/flip with a thread pool, and the Python dataset calls it
through ctypes.  Falls back to PIL transparently when the toolchain or image
libraries are missing (``available()``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "madm_data.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libmadm_data.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-lpng", "-ljpeg", "-lpthread", "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"") or b""
        logger.info(f"native data loader build failed ({e}); {err.decode()[:500]}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logger.info(f"native data loader unavailable: {e}")
        return None
    lib.madm_image_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.madm_image_size.restype = ctypes.c_int
    lib.madm_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.madm_load.restype = ctypes.c_int
    lib.madm_init_pool.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def image_size(path: str):
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.madm_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)):
        raise IOError(f"cannot decode {path}")
    return w.value, h.value, c.value


def load(
    path: str,
    resize_wh=None,
    crop=None,  # (x, y, w, h)
    flip: bool = False,
    nearest: bool = False,
    out_c: int = 3,
) -> np.ndarray:
    """Decode -> resize -> crop/flip, HWC uint8 with ``out_c`` channels."""
    lib = _load()
    assert lib is not None
    if crop is not None:
        out_w, out_h = crop[2], crop[3]
    elif resize_wh is not None:
        out_w, out_h = resize_wh
    else:
        out_w, out_h, _ = image_size(path)
    buf = np.empty((out_h, out_w, out_c), np.uint8)
    rw, rh = resize_wh if resize_wh is not None else (0, 0)
    cx, cy, cw, ch = crop if crop is not None else (0, 0, 0, 0)
    rc = lib.madm_load(
        path.encode(), rw, rh, cx, cy, cw, ch, int(flip), int(nearest),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_c,
    )
    if rc:
        raise IOError(f"native load failed ({rc}) for {path}")
    return buf
