"""ctypes bridge to the native runtime pieces (native/compress.cpp).

The reference implements site-pattern compression in native C
(src/compress.c: ternary string sort + JC69 folding); this is the TPU
build's equivalent, used by the data loader when available.  The
library is built on first use (g++ is part of the image); failures of
any kind fall back to the numpy implementation, which is semantically
identical (tests assert bit-equality).

Set ``BPP_TPU_NATIVE=0`` to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BPP_TPU_NATIVE", "1") == "0":
        return None
    d = _native_dir()
    so = os.path.join(d, "libbppnative.so")
    src = os.path.join(d, "compress.cpp")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", src, "-o", so + ".tmp"],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        lib.bpp_compress_patterns.restype = ctypes.c_int
        lib.bpp_compress_patterns.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.bpp_compress_patterns_u32.restype = ctypes.c_int
        lib.bpp_compress_patterns_u32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def compress_patterns_native(codes: np.ndarray, jc69_fold: bool,
                             sorted_order: bool):
    """Native compress_patterns; returns None when unavailable."""
    lib = _load()
    if lib is None or codes.ndim != 2 or codes.size == 0:
        return None
    n_seq, n_sites = codes.shape
    npat = ctypes.c_int64(0)
    weights = np.zeros(n_sites, np.int32)
    if codes.dtype == np.uint8:
        c = np.ascontiguousarray(codes)
        pats = np.zeros((n_sites, n_seq), np.uint8)
        rc = lib.bpp_compress_patterns(
            c.ctypes.data, n_seq, n_sites, int(jc69_fold),
            int(sorted_order), pats.ctypes.data, weights.ctypes.data,
            ctypes.byref(npat))
    elif codes.dtype == np.uint32:
        if sorted_order or jc69_fold:
            return None     # numpy struct order != memcmp for u32
        c = np.ascontiguousarray(codes)
        pats = np.zeros((n_sites, n_seq), np.uint32)
        rc = lib.bpp_compress_patterns_u32(
            c.ctypes.data, n_seq, n_sites, int(sorted_order),
            pats.ctypes.data, weights.ctypes.data, ctypes.byref(npat))
    else:
        return None
    if rc != 0:
        return None
    n = int(npat.value)
    return (np.ascontiguousarray(pats[:n].T),
            weights[:n].astype(np.int32))
