"""ctypes bindings for the native host data path (native/mval_host.cc).

One C call replaces the loader's PIL decode -> numpy crop -> PIL Lanczos
resize -> BGR flip chain (reference: dataset/dataset.py:158-214).  The
library is built from source with `make -C native`; if the .so is missing we
attempt a one-shot g++ build and otherwise report unavailable so the PIL
path keeps working.

`fast_scale=True` additionally lets libjpeg decode at 1/2^k resolution when
the crop is much larger than the network input — most of the IDCT work for
1080p+ frames disappears.  That mode trades bit-exactness with the
full-resolution path for throughput.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils import get_logger

_logger = get_logger(__name__)
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libmval_host.so")
_lib = None
_unavailable = False


def _load():
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_SO_PATH)],
                check=True,
                capture_output=True,
            )
        except Exception as e:
            _logger.warning("native loader build failed (%s); using PIL path" % e)
            _unavailable = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.decode_crop_resize.restype = ctypes.c_int
        lib.decode_crop_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.decode_jpeg.restype = ctypes.c_int
        lib.decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except OSError as e:
        _logger.warning("native loader unavailable (%s); using PIL path" % e)
        _unavailable = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_crop_resize(
    jpeg_bytes: bytes,
    bbox,
    out_w: int,
    out_h: int,
    bgr_flip: bool = True,
    fast_scale: bool = False,
) -> Optional[np.ndarray]:
    """JPEG bytes + (l, t, r, b) -> uint8 [out_h, out_w, 3], or None when the
    native path is unavailable / decode fails."""
    lib = _load()
    if lib is None:
        return None
    left, top, right, bottom = (int(v) for v in bbox)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.decode_crop_resize(
        jpeg_bytes, len(jpeg_bytes), left, top, right, bottom,
        out_w, out_h, int(bgr_flip), int(fast_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out


def decode_jpeg(jpeg_bytes: bytes) -> Optional[np.ndarray]:
    """Full-resolution RGB decode: bytes -> uint8 [h, w, 3]."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.decode_jpeg(
        jpeg_bytes, len(jpeg_bytes), ctypes.byref(w), ctypes.byref(h),
        ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_jpeg(
        jpeg_bytes, len(jpeg_bytes), ctypes.byref(w), ctypes.byref(h),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
