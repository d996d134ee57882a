"""ctypes bindings for the native host DSP library (cpp/libmstdsp.so).

The library provides bit-accurate sequential implementations of the system's
recurrent DSP (compressor envelope follower, biquad cascade — the reference's
numba/pymixconsole surface, SURVEY.md §2.1) for:
- golden-oracle testing of the TPU scans,
- fast single-core host preprocessing when no accelerator is attached.

The library is compiled on first use (``make -C cpp``); all entry points
gracefully report unavailability if no compiler exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libmstdsp.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _stale() -> bool:
    """True if the library is missing or older than any C++ source."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_CPP_DIR):
        if name.endswith(".cc") and os.path.getmtime(os.path.join(_CPP_DIR, name)) > lib_mtime:
            return True
    return False


def _build() -> bool:
    """Build under an exclusive file lock: concurrent processes (pytest +
    trainer startup) would otherwise run `make` on the same .so at once."""
    try:
        import fcntl

        lock_path = os.path.join(_CPP_DIR, ".build.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if not _stale():  # another process just built it
                    return os.path.exists(_LIB_PATH)
                subprocess.run(
                    ["make", "-C", _CPP_DIR], check=True, capture_output=True, timeout=120
                )
                return os.path.exists(_LIB_PATH)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if _stale() and not _build() and not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    lib.mst_compressor_process.restype = ctypes.c_double
    lib.mst_compressor_process.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.mst_compressor_process_mc.restype = None
    lib.mst_compressor_process_mc.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
    ]
    lib.mst_biquad_lfilter.restype = None
    lib.mst_biquad_lfilter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    lib.mst_biquad_cascade.restype = None
    lib.mst_biquad_cascade.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    if hasattr(lib, "mst_wavbank_create"):  # io surface (cpp/mstio.cc)
        lib.mst_wavbank_create.restype = ctypes.c_void_p
        lib.mst_wavbank_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ]
        for name, res in [
            ("mst_wavbank_ok", ctypes.c_int32),
            ("mst_wavbank_rate", ctypes.c_int32),
            ("mst_wavbank_channels", ctypes.c_int32),
            ("mst_wavbank_frames", ctypes.c_int64),
        ]:
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mst_wavbank_read_segments.restype = ctypes.c_int64
        lib.mst_wavbank_read_segments.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.mst_wavbank_destroy.restype = None
        lib.mst_wavbank_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def compressor_process(
    x: np.ndarray,
    threshold: float,
    attack_ms: float,
    release_ms: float,
    ratio: float,
    makeup_db: float = 0.0,
    sample_rate: float = 44100.0,
) -> np.ndarray:
    """Native compressor over the last axis of ``x [..., T]`` (channels
    independent, zero initial envelope)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable (no compiler?)")
    x = np.ascontiguousarray(x, np.float32)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y = np.empty_like(x2)
    lib.mst_compressor_process_mc(
        _fptr(x2), _fptr(y), x2.shape[0], x2.shape[1],
        float(threshold), float(attack_ms), float(release_ms), float(ratio),
        float(makeup_db), float(sample_rate),
    )
    return y.reshape(shape)


def biquad_lfilter(x: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Native DF2T biquad over 1-D ``x``; ``coeffs = [b0,b1,b2,a1,a2]``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    c = np.ascontiguousarray(coeffs, np.float64)
    y = np.empty_like(x)
    lib.mst_biquad_lfilter(_fptr(x), _fptr(y), x.shape[0], _dptr(c))
    return y


def biquad_cascade(x: np.ndarray, coeffs_list: np.ndarray) -> np.ndarray:
    """Native biquad cascade; ``coeffs_list [n_filters, 5]``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    c = np.ascontiguousarray(coeffs_list, np.float64)
    y = np.empty_like(x)
    lib.mst_biquad_cascade(_fptr(x), _fptr(y), x.shape[0], _dptr(c), c.shape[0])
    return y
