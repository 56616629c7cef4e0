"""ctypes binding for the native wav reader (native/wavio.cpp).

Auto-builds ``libwavio.so`` with the repo Makefile on first use if a compiler
is available; anything unusual (missing toolchain, non-mono/PCM16 files)
falls back to scipy transparently. Decoding in C++ releases the GIL, so the
threaded loader (data/pipeline.py) scales with cores.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")

_lib = None
_lib_failed = False


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int16),
        ("bits_per_sample", ctypes.c_int16),
        ("n_frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
        ("format", ctypes.c_int16),
    ]


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("SMARTVOC_NO_NATIVE"):
        _lib_failed = True
        return None
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.wavio_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
        lib.wavio_info.restype = ctypes.c_int
        lib.wavio_read_f32.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.wavio_read_f32.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # missing toolchain, load failure, ...
        logger.info("native wavio unavailable (%s); using scipy", e)
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load_library() is not None


def read_wav_norm_f32(path: str, scale: float = 32768.0) -> Optional[Tuple[np.ndarray, int]]:
    """Read a mono PCM16 wav as normalized float32 + sample rate.

    Returns None when the native path cannot handle the file (caller falls
    back to scipy).
    """
    lib = _load_library()
    if lib is None:
        return None
    info = _WavInfo()
    if lib.wavio_info(path.encode(), ctypes.byref(info)) != 0:
        return None
    if info.format != 1 or info.channels != 1 or info.bits_per_sample != 16:
        return None
    out = np.empty(info.n_frames, np.float32)
    n = lib.wavio_read_f32(path.encode(), out, info.n_frames, float(scale))
    if n < 0:
        return None
    return out[:n], int(info.sample_rate)
