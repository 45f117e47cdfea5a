"""ctypes binding for the native JPEG decode+resize kernel.

Builds ``grl_tpu/native/jpeg_decoder.cpp`` on first use (g++ + libjpeg,
~1s), caching the .so next to the source — or, when the package
directory is not writable (installed wheels in read-only site-packages),
under ``$XDG_CACHE_HOME/grl_tpu`` — and falls back to PIL transparently
if the toolchain or libjpeg is unavailable. ctypes foreign calls release
the GIL, so the loader's thread pool decodes concurrently — the reason
the reference needed multi-process DataLoader workers
(dataloader.py:36,74) goes away.

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

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "native")
_SRC_PATH = osp.join(_NATIVE_DIR, "jpeg_decoder.cpp")

_lock = threading.Lock()
_lib = None
_available = None


def _so_candidates(digest):
    """Possible .so locations, in preference order: next to the source
    (dev/repo layout), then the user cache dir (installed wheels whose
    site-packages may be read-only)."""
    name = f"libgrljpeg-{digest}.so"
    yield osp.join(_NATIVE_DIR, name)
    cache = os.environ.get("XDG_CACHE_HOME") or osp.expanduser("~/.cache")
    yield osp.join(cache, "grl_tpu", name)


def _build(out_path):
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-ljpeg", "-o", out_path],
        check=True,
        capture_output=True,
    )


def _find_or_build():
    """Return a loadable .so path, building into the first writable
    candidate location when none exists yet.

    The filename carries a hash of the SOURCE CONTENT. An mtime freshness
    check is wrong here twice over: pip preserves wheel-archive
    timestamps, so after an upgrade the packaged source can be OLDER than
    a .so built from the previous version (which would then keep loading
    — wrong numerics, or a segfault on an ABI-changed symbol), and one
    shared $HOME cache must serve venvs/checkouts pinned at different
    versions. Content-addressing solves both; stale-version files are a
    few hundred KB and simply stop being referenced."""
    if not osp.exists(_SRC_PATH):
        # prebuilt deployment without source or toolchain: load the
        # plain-named kernel as-is rather than falling back to PIL
        legacy = osp.join(_NATIVE_DIR, "libgrljpeg.so")
        if osp.exists(legacy):
            return legacy
        raise FileNotFoundError(_SRC_PATH)
    import hashlib

    with open(_SRC_PATH, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:10]
    for so in _so_candidates(digest):
        if osp.exists(so):
            return so
    err = None
    for so in _so_candidates(digest):
        try:
            _build(so)
            return so
        except (OSError, subprocess.CalledProcessError) as e:
            err = e  # read-only dir or failed compile: try the next one
    raise err


def _load():
    global _lib, _available
    with _lock:
        if _available is not None:
            return _available
        try:
            lib = ctypes.CDLL(_find_or_build())
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
