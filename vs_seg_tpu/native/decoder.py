"""ctypes bindings for the native NIFTI decoder (see nifti_decode.cc).

The C++ calls run with the GIL released, so the threaded CacheDataset/loader
workers decompress volumes genuinely in parallel (the reference needed worker
*processes* for this, params/VSparams.py:311-318).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nifti_decode.cc")
_LIB = os.path.join(_HERE, "libnifti_decode.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lz", "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.nd_read_file.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                                         ctypes.POINTER(ctypes.c_int64)]
            lib.nd_read_file.restype = ctypes.c_int
            lib.nd_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
            lib.nd_to_float32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float)]
            lib.nd_to_float32.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_file_bytes(path: str) -> Optional[bytes]:
    """Read + (gz-)inflate a file natively; None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    length = ctypes.c_int64()
    rc = lib.nd_read_file(path.encode(), ctypes.byref(buf), ctypes.byref(length))
    if rc != 0:
        return None
    try:
        return ctypes.string_at(buf, length.value)
    finally:
        lib.nd_free(buf)


# NIFTI datatype code -> element byte size (codes mirrored from the C
# converter's switch in nifti_decode.cc)
_DTYPE_SIZES = {2: 1, 4: 2, 8: 4, 16: 4, 64: 8, 256: 1, 512: 2, 768: 4,
                1024: 8}


def convert_to_float32(payload: bytes, count: int, datatype: int,
                       slope: float, inter: float) -> Optional[np.ndarray]:
    """Native dtype conversion + scl scaling; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    itemsize = _DTYPE_SIZES.get(datatype)
    if itemsize is None or len(payload) < count * itemsize:
        # truncated/corrupt payload: the C converter takes no buffer length
        # and would read out of bounds; fall back to the numpy path, which
        # raises a clean ValueError
        return None
    out = np.empty(count, dtype=np.float32)
    src = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    rc = lib.nd_to_float32(
        src, count, datatype, slope, inter,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out
