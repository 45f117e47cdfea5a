"""ctypes binding for the native JPEG decode+resize kernel.

Builds ``native/jpeg_decoder.cpp`` on first use (g++ + libjpeg, ~1s),
caches the .so next to the source, and falls back to PIL transparently if
the toolchain or libjpeg is unavailable. ctypes foreign calls release the
GIL, so the loader's thread pool decodes concurrently — the reason the
reference needed multi-process DataLoader workers (dataloader.py:36,74)
goes away.

Decode output is bit-identical to PIL (both sit on libjpeg), and the
native resize implements PIL's antialiased separable triangle-filter
resample in the same 8.22 fixed point, so resized output is bit-identical
to ``PIL.Image.resize(..., BILINEAR)`` on both up- and downscale
(tests/test_data.py::test_native_resize_matches_pil).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libgrljpeg.so")
_SRC_PATH = osp.join(_NATIVE_DIR, "jpeg_decoder.cpp")

_lock = threading.Lock()
_lib = None
_available = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-ljpeg", "-o", _SO_PATH],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _available
    with _lock:
        if _available is not None:
            return _available
        try:
            # a prebuilt .so without the source alongside (deployment
            # without a toolchain) must load, not fall back to PIL — only
            # compare mtimes when the source actually exists
            if not osp.exists(_SO_PATH) or (
                osp.exists(_SRC_PATH)
                and os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
            lib.grl_decode_resize.restype = ctypes.c_int
            lib.grl_decode_resize.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_void_p,
            ]
            _lib = lib
            _available = True
        except Exception:
            _available = False
        return _available


def native_available():
    return _load()


def decode_resize(path, height, width):
    """Decode a JPEG file to a (height, width, 3) uint8 array.

    Uses the native kernel when available, PIL otherwise. Raises on
    undecodable input either way.
    """
    if _load():
        with open(path, "rb") as f:
            data = f.read()
        out = np.empty((height, width, 3), np.uint8)
        rc = _lib.grl_decode_resize(
            data, len(data), height, width, out.ctypes.data_as(ctypes.c_void_p)
        )
        if rc == 0:
            return out
        # fall through to PIL for non-JPEG content (e.g. PNG frames)
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        if img.size != (width, height):
            img = img.resize((width, height), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)
