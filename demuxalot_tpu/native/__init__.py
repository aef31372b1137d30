"""Native (C++) components: build-on-demand via the system toolchain.

The shared library is compiled from scanner.cpp on first use and cached next
to the source. Absence of a working toolchain degrades gracefully — callers
fall back to the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "scanner.cpp"
_LIB = _DIR / "libdemuxscan.so"
_HOST_SRC = _DIR / "hostops.cpp"
_HOST_LIB = _DIR / "libdemuxhost.so"

_lib_handle = None
_host_handle = None


def _compile(src: Path, lib: Path, extra=()) -> None:
    import os

    tmp = f"{lib}.{os.getpid()}.tmp"  # unique per process: parallel workers may race
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(src), *extra, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    Path(tmp).replace(lib)  # atomic on POSIX


def _build() -> None:
    _compile(_SRC, _LIB, extra=("-lz",))


def load_host_library() -> ctypes.CDLL:
    """Compile (if needed) and load the host-ops library (sort/join)."""
    global _host_handle
    if _host_handle is not None:
        return _host_handle
    if not _HOST_LIB.exists() or _HOST_LIB.stat().st_mtime < _HOST_SRC.stat().st_mtime:
        _compile(_HOST_SRC, _HOST_LIB, extra=("-pthread",))
    lib = ctypes.CDLL(str(_HOST_LIB))
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.demux_radix_argsort_i64.restype = None
    lib.demux_radix_argsort_i64.argtypes = [i64p, ctypes.c_int64, i64p]
    lib.demux_hash_match_i64.restype = None
    lib.demux_hash_match_i64.argtypes = [
        i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.demux_match_compact_strided.restype = ctypes.c_int64
    lib.demux_match_compact_strided.argtypes = [
        i64p, i64p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, f32p, f32p,
    ]
    lib.demux_collapse_calls.restype = ctypes.c_int64
    lib.demux_collapse_calls.argtypes = [
        i32p, i32p, i32p, f32p, ctypes.c_int64,
        i32p, i32p, i32p, f32p, i64p,
    ]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.demux_group_sum_broadcast.restype = None
    lib.demux_group_sum_broadcast.argtypes = [i64p, f64p, ctypes.c_int64, f64p]
    lib.demux_tile_scatter.restype = None
    lib.demux_tile_scatter.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, i64p, i64p,
        ctypes.c_int32, ctypes.c_int32, i32p, f32p, i32p,
    ]
    lib.demux_band_counts.restype = None
    lib.demux_band_counts.argtypes = [
        i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int32, i64p,
    ]
    lib.demux_tile_scatter_banded.restype = None
    lib.demux_tile_scatter_banded.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64,
        i32p, i64p, ctypes.c_int32,
        i64p, i64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, f32p, i32p,
    ]
    lib.demux_gather3.restype = None
    lib.demux_gather3.argtypes = [
        i64p, ctypes.c_int64, i32p, i32p, f32p, i32p, i32p, f32p,
    ]
    lib.demux_collapse_calls_keyed.restype = ctypes.c_int64
    lib.demux_collapse_calls_keyed.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, i32p, ctypes.c_int32,
        i32p, i32p, f32p, i64p,
    ]
    lib.demux_sort_calls_by_cb.restype = None
    lib.demux_sort_calls_by_cb.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, i32p, i32p, f32p,
    ]
    _host_handle = lib
    return lib


def load_library() -> ctypes.CDLL:
    """Compile (if needed) and load the native scanner library."""
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))

    lib.scan_region.restype = ctypes.c_void_p
    lib.scan_region.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.scan_n_molecules.restype = ctypes.c_int64
    lib.scan_n_molecules.argtypes = [ctypes.c_void_p]
    lib.scan_n_calls.restype = ctypes.c_int64
    lib.scan_n_calls.argtypes = [ctypes.c_void_p]
    lib.scan_fill.restype = None
    lib.scan_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ]
    lib.scan_free.restype = None
    lib.scan_free.argtypes = [ctypes.c_void_p]

    lib.count_coverage.restype = ctypes.c_int
    lib.count_coverage.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]

    _lib_handle = lib
    return lib
