"""Native (C++) runtime kernels, built on demand with g++ and loaded via
ctypes. These cover host-side hot loops whose exact reference semantics are
SIMD-layout-dependent (striped Smith-Waterman)."""
import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None


def _build(so_path):
    src = os.path.join(_DIR, "ssw.cpp")
    cmd = ["g++", "-O3", "-std=c++14", "-shared", "-fPIC", src, "-o", so_path]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    """Load (building if needed) the native kernel library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so_path = os.path.join(_DIR, "_native.so")
        src = os.path.join(_DIR, "ssw.cpp")
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            _build(so_path)
        _LIB = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        _LIB.ssw_byte.argtypes = [u8p, ctypes.c_int, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_uint8,
                                  ctypes.c_uint8, u8p, ctypes.c_uint8,
                                  ctypes.c_uint8, ctypes.c_int32, u8p, i32p]
        _LIB.ssw_word.argtypes = [u8p, ctypes.c_int, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_uint16,
                                  ctypes.c_uint16, u16p, ctypes.c_uint16,
                                  ctypes.c_int32, u16p, i32p]
        return _LIB
