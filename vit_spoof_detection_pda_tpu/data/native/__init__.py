"""ctypes bindings for the native decode+resize module.

Builds ``_decoder.so`` from decoder.cpp on first use (g++, links libjpeg +
libpng — both in the base image) and caches it next to the source.  The
data pipeline uses this as its fast path; PIL remains the fallback
(disable explicitly with PAD_NATIVE_DECODE=0).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SO = _HERE / "_decoder.so"
_SRC = _HERE / "decoder.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC),
           "-ljpeg", "-lpng", "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:                        # noqa: BLE001
        log.warning("native decoder build failed (%s); using PIL", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PAD_NATIVE_DECODE", "1") == "0":
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.pad_decode_resize.restype = ctypes.c_int
            lib.pad_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            if hasattr(lib, "pad_encode_jpeg"):   # older cached .so
                lib.pad_encode_jpeg.restype = ctypes.c_int
                lib.pad_encode_jpeg.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                    ctypes.POINTER(ctypes.c_ulong)]
                lib.pad_free.restype = None
                lib.pad_free.argtypes = [ctypes.c_void_p]
            _lib = lib
            log.info("native decoder loaded (%s)", _SO.name)
        except OSError as e:
            log.warning("native decoder load failed (%s); using PIL", e)
    return _lib


def native_decode(path: str, size: int, resize: str = "exact"
                  ) -> Optional[np.ndarray]:
    """Decode+resize via the native module; None on any failure (caller
    falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    out = np.empty((size, size, 3), np.uint8)
    mode = 0 if resize == "exact" else 1
    rc = lib.pad_decode_resize(
        data, len(data), size, mode,
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def native_encode_jpeg(arr: np.ndarray, quality: int = 95
                       ) -> Optional[bytes]:
    """Encode an RGB u8 HWC array to JPEG bytes via the native module
    (GIL released for the whole compress — the materializer's thread
    pool scales past PIL's per-image Python overhead); None on any
    failure (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pad_encode_jpeg"):
        return None
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        return None
    arr = np.ascontiguousarray(arr)
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    size = ctypes.c_ulong()
    rc = lib.pad_encode_jpeg(
        arr.ctypes.data_as(ctypes.c_void_p),
        int(arr.shape[0]), int(arr.shape[1]), int(quality),
        ctypes.byref(buf), ctypes.byref(size))
    if rc != 0 or not buf:
        return None
    try:
        return ctypes.string_at(buf, size.value)
    finally:
        lib.pad_free(buf)
