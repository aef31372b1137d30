"""Python wrappers for the C++ host-ops library (sort/join primitives).

Product-scale packing and kernel-layout builds are dominated by numpy's
stable argsort (~1.7 s at 9.2M int64 keys on this host) and searchsorted
(~1.4 s for 9.2M probes); the native routines run the same contracts
~10x faster (see hostops.cpp). Every wrapper falls back to the numpy
implementation when the toolchain is unavailable, and the numpy path
remains the semantic definition — parity is pinned by
tests/test_native_hostops.py.
"""
from __future__ import annotations

import ctypes

import numpy as np

_lib = None
_lib_failed = False


def _host_lib():
    global _lib, _lib_failed
    if _lib is None and not _lib_failed:
        try:
            from . import load_host_library

            _lib = load_host_library()
        except Exception:
            _lib_failed = True
    return _lib


def stable_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable ascending argsort for integer keys; returns int64 order.

    Exact drop-in for ``np.argsort(keys, kind="stable")`` on integer
    arrays (the native radix path requires non-negative keys; negatives
    fall back to numpy).
    """
    keys = np.ascontiguousarray(keys)
    n = len(keys)
    lib = _host_lib()
    if (
        lib is None
        or n < 65_536  # numpy wins below ~64k (native call setup + copies)
        or not np.issubdtype(keys.dtype, np.integer)
        or (n and int(keys.min()) < 0)
    ):
        return np.argsort(keys, kind="stable")
    keys64 = np.ascontiguousarray(keys, dtype=np.int64)
    order = np.empty(n, dtype=np.int64)
    lib.demux_radix_argsort_i64(
        keys64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order


def match_keys(table_keys: np.ndarray, table_vals: np.ndarray,
               queries: np.ndarray) -> np.ndarray:
    """For each query key: the matching table value, or -1 when absent.

    Semantics of the sorted-join idiom
    ``idx = searchsorted(table, q).clip(0, m-1); where(table[idx] == q, vals[idx], -1)``
    with unique non-negative table keys, via an L2-resident hash table.
    """
    table_keys = np.ascontiguousarray(table_keys, dtype=np.int64)
    table_vals = np.ascontiguousarray(table_vals, dtype=np.int64)
    queries = np.ascontiguousarray(queries, dtype=np.int64)
    m, n = len(table_keys), len(queries)
    lib = _host_lib()
    if lib is None or m == 0 or n < 65_536 or (m and int(table_keys.min()) < 0):
        if m == 0:
            return np.full(n, -1, dtype=np.int64)
        order = np.argsort(table_keys, kind="stable")
        sorted_keys = table_keys[order]
        idx = np.searchsorted(sorted_keys, queries).clip(0, m - 1)
        return np.where(
            sorted_keys[idx] == queries, table_vals[order][idx], -1
        ).astype(np.int64)
    out = np.empty(n, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.demux_hash_match_i64(
        table_keys.ctypes.data_as(i64p), table_vals.ctypes.data_as(i64p), m,
        queries.ctypes.data_as(i64p), n, out.ctypes.data_as(i64p),
    )
    return out
