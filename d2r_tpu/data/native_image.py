"""ctypes bridge to the native (C) image loader.

Builds native/libd2rimage.so on first use (cc + libjpeg/libpng, both baked
into the image) and exposes :func:`native_load_image` with the same contract
as data/image.py's PIL path. Any native error code returns None so callers
fall back to PIL -> inf.png -> grey frame, preserving the reference's fault
chain (ref: processor/dataset.py:94-97). The C call runs without the GIL, so
the thread-pool loader gets real decode parallelism.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from d2r_tpu.data.image import CLIP_MEAN, CLIP_STD

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libd2rimage.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "imagedec.c"))

_lock = threading.Lock()
_lib = None
_build_failed = False


def _ensure_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH,
                     _SRC_PATH, "-ljpeg", "-lpng", "-lm"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.d2r_load_image.restype = ctypes.c_int
            lib.d2r_load_image.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def native_load_image(path: str, image_size: int = 224,
                      raw_uint8: bool = False) -> Optional[np.ndarray]:
    """Decode+preprocess via the C library; None on any failure.

    ``raw_uint8``: return resized/cropped RAW pixels (pixel_transfer='uint8'
    mode) by calling the C resampler with mean=0, std=1/255 — the output is
    then the float pixel value in [0, 255], rounded back to uint8. The C
    path resamples in float precision, so this re-quantisation costs at most
    1 LSB vs its float output (PARITY.md pixel-transfer note).
    """
    lib = _ensure_lib()
    if lib is None:
        return None
    out = np.empty((3, image_size, image_size), dtype=np.float32)
    if raw_uint8:
        mean = np.zeros(3, dtype=np.float32)
        std = np.full(3, 1.0 / 255.0, dtype=np.float32)
    else:
        mean = CLIP_MEAN.astype(np.float32)
        std = CLIP_STD.astype(np.float32)
    rc = lib.d2r_load_image(
        path.encode("utf-8"), image_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    if raw_uint8:
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out
