"""Native host-side data-loader kernels (C++ via ctypes).

Compiled on first use into the package directory; falls back to numpy when no
toolchain is available. See fastloader.cpp for rationale.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_fastloader.so")
_LIB = None
_TRIED = False


def _build():
    src = os.path.join(_HERE, "fastloader.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", src, "-o", _SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
            os.path.join(_HERE, "fastloader.cpp")
        ):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.gather_cast_u8_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_int,
        ]
        lib.gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:  # no toolchain / build failure → numpy fallback
        print(f"cmf_tpu.data.native: falling back to numpy ({e})", file=sys.stderr)
        _LIB = None
    return _LIB


def gather_cast(src, idx, scale=1.0, shift=0.0, num_threads=0):
    """dst[i] = src[idx[i]].astype(f32) * scale + shift, fused + threaded.

    src: (N, ...) uint8 or float32 contiguous; idx: (M,) integer rows.
    """
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((idx.shape[0], *src.shape[1:]), dtype=np.float32)
    lib = get_lib()
    if lib is None:
        np.multiply(src[idx], scale, out=out, casting="unsafe")
        if shift:
            out += shift
        return out
    src = np.ascontiguousarray(src)
    if src.dtype == np.uint8:
        lib.gather_cast_u8_f32(
            out.ctypes.data, src.ctypes.data, idx.ctypes.data,
            idx.shape[0], row_elems, ctypes.c_float(scale), ctypes.c_float(shift),
            num_threads,
        )
    elif src.dtype == np.float32 and scale == 1.0 and shift == 0.0:
        lib.gather_f32(
            out.ctypes.data, src.ctypes.data, idx.ctypes.data,
            idx.shape[0], row_elems, num_threads,
        )
    else:
        np.multiply(src[idx], scale, out=out, casting="unsafe")
        if shift:
            out += shift
    return out
