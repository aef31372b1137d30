"""Deterministic integer encodings for nucleotides and molecule barcodes.

The numeric scheme is fixed by the on-disk/checkpoint formats and by
cross-run reproducibility requirements, and therefore matches the reference
library bit-for-bit (demuxalot/utils.py:12-36): bases map A,C,G,T,N -> 0..4
and a UMI string maps to a base-5 polynomial residue modulo the largest
prime below 2**32. Everything else about this module (vectorized LUT
encoder, scatter-add helper) is framework-specific.
"""
from __future__ import annotations

from functools import reduce

import numpy as np

NUCLEOTIDES = "ACGTN"

# dict view of the nucleotide ordering, part of the public utils surface
base_lookup = {nt: code for code, nt in enumerate(NUCLEOTIDES)}

# largest prime that fits below 2**32; residues stay int32-addressable
_UMI_MODULUS = 2147483629


def hash_string(s: str) -> int:
    """Deterministic integer for a molecule-barcode (UMI) string.

    Horner evaluation of the string's ordinals in base 5, reduced modulo
    ``_UMI_MODULUS``. Collisions are vanishingly rare for the short
    fixed-alphabet UMIs this is applied to, and determinism (unlike
    Python's salted ``hash``) makes runs reproducible.
    """
    return reduce(lambda acc, ch: acc * 5 + ord(ch), s, 0) % _UMI_MODULUS


def compress_base(base: str) -> int:
    """Single nucleotide character -> code in 0..4 (A,C,G,T,N)."""
    return base_lookup[base]


def decompress_base(base_index: int) -> str:
    """Code in 0..4 -> nucleotide character."""
    return NUCLEOTIDES[base_index]


# byte-value -> base code table for the vectorized encoder (255 = invalid)
_BASE_CODE_OF_BYTE = np.full(256, 255, dtype=np.uint8)
for _nt, _code in base_lookup.items():
    _BASE_CODE_OF_BYTE[ord(_nt)] = _code


def compress_bases_vectorized(bases: np.ndarray) -> np.ndarray:
    """Array of single-character base strings -> uint8 codes, via byte LUT."""
    as_bytes = np.frombuffer(np.asarray(bases, dtype="S1").tobytes(), dtype=np.uint8)
    codes = _BASE_CODE_OF_BYTE[as_bytes]
    if codes.max(initial=0) == 255:
        offenders = sorted(set(np.asarray(bases)[codes == 255]))
        raise KeyError(f"not nucleotide characters: {offenders}")
    return codes


def fast_np_add_at_1d(x: np.ndarray, indices, weights) -> None:
    """In-place scatter-add of ``weights`` into ``x`` at ``indices``.

    ``np.bincount`` is far faster than ``np.add.at`` for this shape of
    update; kept under the reference helper's name (demuxalot/utils.py:35)
    for API familiarity. On device the same reduction is a
    ``jax.ops.segment_sum``.
    """
    x += np.bincount(indices, weights=weights, minlength=len(x)).astype(x.dtype, copy=False)
