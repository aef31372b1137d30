"""Hook for the C++ bulk BAM scanner.

The native scanner (demuxalot_tpu/native) fuses BGZF decompression, record
decoding, read filtering, molecule grouping, and consensus calling into one
C++ pass — replacing the per-read Python loop on the hot ingest path. This
module loads it when built and transparently falls back otherwise.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def try_count_snps_native(
    bamfile_location,
    chromosome2positions: Dict[str, np.ndarray],
    barcode_handler,
    parse_read,
    n_jobs,
    required: bool = False,
):
    """Return per-chromosome CompressedSNPCalls via the C++ scanner, or None.

    Falls back (returns None) when the native library is not built, when the
    input is a multi-BAM dict, or when a custom ``parse_read`` callable is in
    use (the native path only encodes the standard tag-based filter).
    """
    try:
        from ..native import scanner  # noqa: F401
    except Exception:
        if required:
            raise RuntimeError("native=True requested but the C++ scanner is not built")
        return None
    return scanner.count_snps_native(
        bamfile_location, chromosome2positions, barcode_handler, parse_read, n_jobs,
        required=required,
    )
