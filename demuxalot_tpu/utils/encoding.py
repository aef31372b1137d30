"""Deterministic encodings for bases and molecule (UMI) barcodes.

Semantics match the reference library so that downstream numerics are
reproducible bit-for-bit (reference: demuxalot/utils.py:12-32).
"""
from __future__ import annotations

import numpy as np

# Largest prime below 2**32 - 1; residues fit an int32-friendly range.
_UMI_HASH_PRIME = 2147483629

base_lookup = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}

_BASES = "ACGTN"


def hash_string(s: str) -> int:
    """Compress a molecule barcode (UMI) string into a deterministic integer.

    Base-5-ish polynomial rolling hash over character ordinals, reduced modulo
    the largest prime below 2**32 (reference: demuxalot/utils.py:12-22).
    Deterministic and collision-sparse for the short A/C/G/T UMIs in use.
    """
    result = 0
    for c in s:
        result = result * 5 + ord(c)
    return result % _UMI_HASH_PRIME


def compress_base(base: str) -> int:
    """Map A/C/G/T/N to 0..4 (reference: demuxalot/utils.py:27-28)."""
    return base_lookup[base]


def decompress_base(base_index: int) -> str:
    """Inverse of :func:`compress_base` (reference: demuxalot/utils.py:31-32)."""
    return _BASES[base_index]


def compress_bases_vectorized(bases: np.ndarray) -> np.ndarray:
    """Vectorized A/C/G/T/N -> 0..4 for arrays of single-character strings."""
    lut = np.full(256, 255, dtype=np.uint8)
    for b, i in base_lookup.items():
        lut[ord(b)] = i
    codes = np.frombuffer(np.asarray(bases, dtype="S1").tobytes(), dtype=np.uint8)
    out = lut[codes]
    if (out == 255).any():
        bad = set(np.asarray(bases)[out == 255])
        raise KeyError(f"unknown bases: {bad}")
    return out


def fast_np_add_at_1d(x: np.ndarray, indices, weights) -> None:
    """Scatter-add ``weights`` into ``x`` at ``indices`` via bincount.

    In-place, like the reference helper (demuxalot/utils.py:35-36). The
    device-side equivalent in this framework is ``jax.ops.segment_sum``.
    """
    x[:] = x + np.bincount(indices, weights=weights, minlength=len(x))
