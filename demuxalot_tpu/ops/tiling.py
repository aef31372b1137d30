"""Host-side tiled call layout for the Pallas likelihood kernel.

Barcodes are grouped into tiles of ``TB``; each tile's calls (contiguous
after the barcode sort) are padded to whole chunks of ``TC``. The kernel
walks chunks in order, accumulating each chunk into its tile's logits block
held in VMEM — chunk→tile ownership rides along as a scalar-prefetch array.
Every tile gets at least one chunk so all output blocks are initialized.

Layout note: per-call vectors are stored ``[1, n_chunks*TC]`` so kernel
blocks of ``(1, TC)`` satisfy Mosaic's tiling rule (sublane dim equals the
full array dim, lane dim a multiple of 128).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class TiledCalls:
    vid: np.ndarray  # i32 [n_chunks * TC] variant id per call (padding → 0)
    cb_local: np.ndarray  # i32 [1, n_chunks * TC] barcode index within tile (padding → 0)
    q: np.ndarray  # f32 [1, n_chunks * TC] p_base_wrong (padding → 1)
    chunk2tile: np.ndarray  # i32 [n_chunks]
    n_barcodes: int
    n_tiles: int
    tile_barcodes: int  # TB
    chunk_calls: int  # TC

    @property
    def n_chunks(self) -> int:
        return len(self.chunk2tile)


def tile_barcode_calls(
    cb_sorted: np.ndarray,
    vid_sorted: np.ndarray,
    q_sorted: np.ndarray,
    n_barcodes: int,
    tile_barcodes: int = 32,
    chunk_calls: int = 512,
) -> TiledCalls:
    """Lay out barcode-sorted calls into per-tile padded chunks (vectorized)."""
    TB, TC = tile_barcodes, chunk_calls
    n_tiles = max(1, -(-n_barcodes // TB))
    n_calls = len(cb_sorted)

    tile_of_call = (cb_sorted // TB).astype(np.int64)
    boundaries = np.searchsorted(tile_of_call, np.arange(n_tiles + 1))
    counts = boundaries[1:] - boundaries[:-1]
    chunks_per_tile = np.maximum(1, -(-counts // TC))
    n_chunks = int(chunks_per_tile.sum())

    vid = np.zeros(n_chunks * TC, dtype=np.int32)
    cb_local = np.zeros(n_chunks * TC, dtype=np.int32)
    q = np.ones(n_chunks * TC, dtype=np.float32)
    chunk2tile = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile)

    chunk_starts = np.concatenate([[0], np.cumsum(chunks_per_tile)[:-1]])
    if n_calls:
        within_tile = np.arange(n_calls, dtype=np.int64) - boundaries[tile_of_call]
        dst = chunk_starts[tile_of_call] * TC + within_tile
        vid[dst] = vid_sorted
        cb_local[dst] = cb_sorted - tile_of_call * TB
        q[dst] = q_sorted

    return TiledCalls(
        vid=vid,
        cb_local=cb_local.reshape(1, -1),
        q=q.reshape(1, -1),
        chunk2tile=chunk2tile,
        n_barcodes=n_barcodes,
        n_tiles=n_tiles,
        tile_barcodes=TB,
        chunk_calls=TC,
    )
