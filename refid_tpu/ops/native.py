"""ctypes loader for the native host ops (no pybind11 in this image).

Compiles ``native/voxelize.cc`` to a shared object on first use (g++ -O3,
~1 s) and caches it next to the source.  Falls back to numpy transparently
when no compiler is available — call sites use :func:`voxelize_native_or_none`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "voxelize.cc")
_SO = os.path.join(_REPO_ROOT, "native", "libvoxelize.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.voxelize_events.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float)]
            lib.voxelize_events.restype = None
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def voxelize_native_or_none(events: np.ndarray, num_bins: int, width: int,
                            height: int) -> Optional[np.ndarray]:
    """Native scatter voxelization; returns None if the .so is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    events = np.ascontiguousarray(events, np.float32)
    out = np.zeros((num_bins, height, width), np.float32)
    lib.voxelize_events(
        events.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(events.shape[0]), ctypes.c_int32(num_bins),
        ctypes.c_int32(width), ctypes.c_int32(height),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
