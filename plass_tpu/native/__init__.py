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


_SOURCES = ["ssw.cpp", "extend.cpp", "nucl_extend.cpp", "banded.cpp",
            "tantan.cpp", "pssm.cpp", "ungapped.cpp", "profilestates.cpp",
            "gather.cpp", "finish.cpp", "aln2nucl.cpp"]


def _build(so_path):
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    # -mavx2: pssm.cpp mirrors the reference's AVX2 rcp/NR weight kernel
    # (the reference binaries are -march=native AVX2 builds)
    cmd = ["g++", "-O3", "-std=c++14", "-mavx2", "-fopenmp", "-shared",
           "-fPIC", *srcs, "-o", so_path]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    """Load (building if needed) the native kernel library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so_path = os.path.join(_DIR, "_native.so")
        srcs = [os.path.join(_DIR, s) for s in _SOURCES]
        if (not os.path.exists(so_path)
                or any(os.path.getmtime(so_path) < os.path.getmtime(s)
                       for s in srcs)):
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
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f64p = ctypes.POINTER(ctypes.c_double)
        i16p = ctypes.POINTER(ctypes.c_int16)
        _LIB.assemble_greedy.argtypes = [
            u8p, i64p, i32p, u32p, ctypes.c_int32,
            i64p, u32p, i32p, i32p, f64p, i32p, i32p, i32p, i32p, i32p,
            i32p, i32p, i16p, ctypes.c_double, ctypes.c_int64,
            u8p, u8p, ctypes.c_int64, i64p, i64p, u8p]
        _LIB.assemble_greedy.restype = ctypes.c_int
        _LIB.nucl_assemble_greedy.argtypes = [
            u8p, i64p, i32p, u32p, ctypes.c_int32,
            i64p, u32p, i32p, i32p, f64p, i32p, i32p, i32p, i32p, i32p,
            i32p, i32p, i16p, u8p, ctypes.c_double, ctypes.c_int64,
            u8p, u8p, ctypes.c_int64, i64p, i64p, u8p]
        _LIB.nucl_assemble_greedy.restype = ctypes.c_int
        _LIB.guided_assemble_greedy.argtypes = [
            u8p, i64p, i32p, u8p, i64p, i32p, u32p, ctypes.c_int32,
            i64p, i32p, u32p, i32p, i32p, f64p, i32p, i32p, i32p, i32p,
            i32p, i32p, i32p, i16p, ctypes.c_double, ctypes.c_int64, u8p,
            u8p, ctypes.c_int64, i64p, i64p,
            u8p, ctypes.c_int64, i64p, i64p, u8p]
        _LIB.guided_assemble_greedy.restype = ctypes.c_int
        i8p = ctypes.POINTER(ctypes.c_int8)
        _LIB.banded_backtrace.argtypes = [
            u8p, ctypes.c_int32, u8p, ctypes.c_int32, i8p, i8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _LIB.banded_backtrace.restype = ctypes.c_int64
        f64p = ctypes.POINTER(ctypes.c_double)
        _LIB.tantan_mask.argtypes = [
            u8p, ctypes.c_int64, f64p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_uint8]
        _LIB.tantan_mask.restype = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        _LIB.pssm_compute.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_float, ctypes.c_float, f64p, f32p,
            i8p, f32p, f32p, u8p]
        _LIB.pssm_neff_to_char.argtypes = [ctypes.c_float]
        _LIB.pssm_neff_to_char.restype = ctypes.c_uint8
        _LIB.pssm_score_mask.argtypes = [ctypes.c_float]
        _LIB.pssm_score_mask.restype = ctypes.c_uint8
        _LIB.pssm_score_unmask.argtypes = [ctypes.c_uint8]
        _LIB.pssm_score_unmask.restype = ctypes.c_float
        _LIB.pssm_neff_to_float.argtypes = [ctypes.c_uint8]
        _LIB.pssm_neff_to_float.restype = ctypes.c_float
        _LIB.pssm_scalar_prod20.argtypes = [f32p, f32p]
        _LIB.pssm_scalar_prod20.restype = ctypes.c_float
        _LIB.pssm_flog2.argtypes = [ctypes.c_float]
        _LIB.pssm_flog2.restype = ctypes.c_float
        _LIB.ungapped_max_score.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint8, u8p,
            ctypes.c_int64]
        _LIB.ungapped_max_score.restype = ctypes.c_int32
        _LIB.ungapped_all.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint8, u8p,
            i64p, i64p, ctypes.c_int64, i32p]
        _LIB.pssm_seq_weights.argtypes = [u8p, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int64,
                                          f32p]
        _LIB.ps_fpow2.argtypes = [ctypes.c_float]
        _LIB.ps_fpow2.restype = ctypes.c_double
        _LIB.ps_score.argtypes = [f32p, f32p, f32p]
        _LIB.ps_score.restype = ctypes.c_float
        _LIB.ps_disc_scores.argtypes = [f32p, f32p, ctypes.c_int64,
                                        ctypes.c_int64, f32p]
        _LIB.ps_discretize.argtypes = [f32p, ctypes.c_int64, f32p, f32p,
                                       f32p, f32p, ctypes.c_int64,
                                       ctypes.c_int64, u8p]
        _LIB.ps_discretize_cs219.argtypes = [f32p, ctypes.c_int64, f32p,
                                             f32p, f32p, ctypes.c_int64, u8p]
        _LIB.pq_map_profile.argtypes = [f32p, f64p, ctypes.c_int64,
                                        ctypes.c_int32, i16p, u32p, i8p]
        _LIB.gather_records.argtypes = [u8p, i64p, i64p, i64p,
                                        ctypes.c_int64, u8p]
        _LIB.pad_records.argtypes = [u8p, i64p, i32p, ctypes.c_int64, u8p,
                                     u8p, ctypes.c_int64]
        _LIB.rescore_finish.argtypes = [
            ctypes.c_int64, i64p, i32p, i32p, i32p, i32p, u8p, i64p, i32p,
            i32p, i32p, i64p, f64p, f64p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, u8p, u8p]
        _LIB.aln2nucl_score.argtypes = [
            ctypes.c_int64, u8p, i64p, i32p, i32p, i32p, i32p, i32p,
            i16p, i32p, f64p]
        return _LIB
