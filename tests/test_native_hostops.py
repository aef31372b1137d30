"""Native host-ops (radix argsort / hash join) vs their numpy definitions.

The numpy fallbacks inside native/hostops.py are the semantic ground truth;
the native paths must be bit-identical (stable order included). The native
library requirement mirrors test_native_scanner: skip without a toolchain,
hard-fail under DEMUX_NATIVE_REQUIRED=1 (CI).
"""
import os
import shutil

import numpy as np
import pytest

from demuxalot_tpu.native.hostops import match_keys, stable_argsort

gxx_available = shutil.which("g++") is not None or bool(os.environ.get("DEMUX_NATIVE_REQUIRED"))


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
@pytest.mark.parametrize("seed", [0, 1])
def test_radix_argsort_matches_numpy_stable(seed):
    rng = np.random.RandomState(seed)
    # above the native threshold, with heavy duplicates to exercise stability
    n = 200_000
    for keys in (
        rng.randint(0, 50, n).astype(np.int64),  # tiny key space, long runs
        (rng.randint(0, 1 << 17, n).astype(np.int64) << 17) | rng.randint(0, 1 << 17, n),
        rng.randint(0, 2**48, n).astype(np.int64),  # wide keys, many passes
        np.zeros(n, dtype=np.int64),  # fully constant: zero passes
        np.arange(n, dtype=np.int64)[::-1].copy(),  # strictly decreasing
    ):
        got = stable_argsort(keys)
        want = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_radix_argsort_small_and_int32():
    rng = np.random.RandomState(2)
    small = rng.randint(0, 1000, 500).astype(np.int32)  # below threshold: numpy path
    np.testing.assert_array_equal(
        stable_argsort(small), np.argsort(small, kind="stable")
    )
    big32 = rng.randint(0, 2**31 - 1, 100_000).astype(np.int32)
    np.testing.assert_array_equal(
        stable_argsort(big32), np.argsort(big32, kind="stable")
    )


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_hash_match_matches_searchsorted_join(seed=3):
    rng = np.random.RandomState(seed)
    m, n = 4_096, 200_000
    table_keys = rng.choice(10 * m, m, replace=False).astype(np.int64)
    table_vals = rng.permutation(m).astype(np.int64)
    queries = rng.randint(0, 10 * m, n).astype(np.int64)

    got = match_keys(table_keys, table_vals, queries)

    order = np.argsort(table_keys, kind="stable")
    sorted_keys = table_keys[order]
    idx = np.searchsorted(sorted_keys, queries).clip(0, m - 1)
    want = np.where(sorted_keys[idx] == queries, table_vals[order][idx], -1)
    np.testing.assert_array_equal(got, want)
    assert (got == -1).any() and (got >= 0).any()  # both outcomes exercised


def test_hash_match_empty_table():
    out = match_keys(
        np.empty(0, np.int64), np.empty(0, np.int64), np.arange(10, dtype=np.int64)
    )
    np.testing.assert_array_equal(out, np.full(10, -1))
