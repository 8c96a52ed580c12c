"""Native (C++) host-side components, loaded via ctypes.

The shared library is built on demand from source (g++ available in the
image; no pybind11, so a plain C ABI + ctypes is used). If the toolchain is
unavailable the callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_LIB_DIR, 'libddsp_piano_native.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.join(_LIB_DIR, 'voice_allocator.cc')
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            try:
                subprocess.run(['sh', os.path.join(_LIB_DIR, 'build.sh')],
                               check=True, capture_output=True)
            except (subprocess.CalledProcessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.allocate_voices.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.allocate_voices.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def allocate_voices(roll: np.ndarray, n_synths: int):
    """C++ voice allocation: (n_frames, 88, 2) roll ->
    ((n_frames, n_synths, 2) conditioning, (n_frames,) polyphony).

    Raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    roll = np.ascontiguousarray(roll, np.float32)
    n_frames = roll.shape[0]
    conditioning = np.zeros((n_frames, n_synths, 2), np.float32)
    polyphony = np.zeros((n_frames,), np.float32)
    lib.allocate_voices(
        roll.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_frames), ctypes.c_int(n_synths),
        conditioning.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        polyphony.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return conditioning, polyphony
