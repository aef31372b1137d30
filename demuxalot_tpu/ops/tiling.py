"""Host-side tiled call layout for the Pallas likelihood kernel.

Barcodes are grouped into tiles of ``TB``; each tile's calls (contiguous
after the barcode sort) are padded to whole chunks of ``TC``. The kernel
walks chunks in order, accumulating each chunk into its tile's logits block
held in VMEM — chunk→tile ownership rides along as a scalar-prefetch array.
Every tile gets at least one chunk so all output blocks are initialized.

**Group structure** (the key to a small scatter): with ``G = TC // 128``
each segment's (barcode's / variant's) calls are padded to a multiple of
G and chunk slot ``i`` is stored at lane ``(i % G) * GPC + i // G``
(``GPC = TC // G``), so *group a* — slots ``aG..aG+G-1``, all one
segment — occupies lane ``a`` of G consecutive GPC-lane blocks. The
kernel folds the per-call values into per-group sums with G−1 aligned
vector adds and the scatter matmul contracts only GPC (=128) one-hot
columns per chunk instead of TC. ``seg_group`` maps each group to its
segment index within the tile. Cost: ~(G−1)/2 padding slots per segment
(q = 1 rows, exact no-ops).

Layout note: per-call vectors are stored ``[1, n_chunks*TC]`` so kernel
blocks of ``(1, TC)`` satisfy Mosaic's tiling rule (sublane dim equals the
full array dim, lane dim a multiple of 128).
"""
from __future__ import annotations

from dataclasses import dataclass

import os

import numpy as np


def chunk_group(chunk_calls: int) -> int:
    """Calls per group: G = TC // 128 (1 for sub-128 test chunks)."""
    return max(1, chunk_calls // 128)


@dataclass
class TiledCalls:
    vid: np.ndarray  # i32 [n_chunks * TC] variant id per call (padding → 0)
    seg_group: np.ndarray  # i32 [1, n_chunks * GPC] segment index within tile per group
    q: np.ndarray  # f32 [1, n_chunks * TC] p_base_wrong (padding → 1)
    chunk2tile: np.ndarray  # i32 [n_chunks]
    n_barcodes: int
    n_tiles: int
    tile_barcodes: int  # TB
    chunk_calls: int  # TC

    @property
    def n_chunks(self) -> int:
        return len(self.chunk2tile)

    @property
    def group(self) -> int:
        return chunk_group(self.chunk_calls)

    @property
    def groups_per_chunk(self) -> int:
        return self.chunk_calls // self.group


def per_call_segments(tiled) -> np.ndarray:
    """Tile-local segment index per call slot ([n_chunks * TC] i32).

    Inverts the group lane mapping (slot at lane ``j·GPC + a`` belongs to
    group ``a``) — used by layout round-trip tests and diagnostics.
    """
    gpc = tiled.groups_per_chunk
    seg = np.asarray(tiled.seg_group).reshape(-1, gpc)  # [n_chunks, gpc]
    lane_group = np.arange(tiled.chunk_calls) % gpc
    return seg[:, lane_group].reshape(-1)


def tile_barcode_calls(
    cb_sorted: np.ndarray,
    vid_sorted: np.ndarray,
    q_sorted: np.ndarray,
    n_barcodes: int,
    tile_barcodes: int = 32,
    chunk_calls: int = 512,
) -> TiledCalls:
    """Lay out barcode-sorted calls into per-tile padded, grouped chunks."""
    TB, TC = tile_barcodes, chunk_calls
    G = chunk_group(TC)
    GPC = TC // G
    assert TC % G == 0
    n_tiles = max(1, -(-n_barcodes // TB))
    nb_pad = n_tiles * TB
    n_calls = len(cb_sorted)

    counts = np.bincount(cb_sorted, minlength=nb_pad).astype(np.int64)
    padded = -(-counts // G) * G  # per-segment slots, group-aligned
    tile_slots = padded.reshape(n_tiles, TB).sum(axis=1)
    chunks_per_tile = np.maximum(1, -(-tile_slots // TC))
    n_chunks = int(chunks_per_tile.sum())
    chunk_start = np.concatenate([[0], np.cumsum(chunks_per_tile)[:-1]])

    vid = np.zeros(n_chunks * TC, dtype=np.int32)
    seg_group = np.zeros(n_chunks * GPC, dtype=np.int32)
    q = np.ones(n_chunks * TC, dtype=np.float32)
    chunk2tile = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile)

    if n_calls:
        slot_cum = np.concatenate([[0], np.cumsum(padded)])
        tile_of_b = np.arange(nb_pad, dtype=np.int64) // TB
        b_offset = slot_cum[:-1] - slot_cum[tile_of_b * TB]

        from ..native.hostops import tile_scatter

        if not tile_scatter(cb_sorted, vid_sorted, q_sorted, b_offset,
                            np.asarray(chunk_start, dtype=np.int64), TB, TC,
                            vid, q, seg_group):
            call_start = np.concatenate([[0], np.cumsum(counts)])
            b = cb_sorted.astype(np.int64)
            rank = np.arange(n_calls, dtype=np.int64) - call_start[b]
            s = b_offset[b] + rank  # slot within the tile's call stream
            c_global = chunk_start[tile_of_b[b]] + s // TC
            i_in = s % TC
            lane = (i_in % G) * GPC + i_in // G
            vid[c_global * TC + lane] = vid_sorted
            q[c_global * TC + lane] = q_sorted
            seg_group[c_global * GPC + i_in // G] = (b - tile_of_b[b] * TB).astype(np.int32)

    return TiledCalls(
        vid=vid,
        seg_group=seg_group.reshape(1, -1),
        q=q.reshape(1, -1),
        chunk2tile=chunk2tile,
        n_barcodes=n_barcodes,
        n_tiles=n_tiles,
        tile_barcodes=TB,
        chunk_calls=TC,
    )


@dataclass
class BandedTiledCalls:
    """Tiled calls split into variant *bands* for gather-friendly tables.

    XLA's gather throughput cliffs once the genotype table outgrows ~16 MB
    (docs/DESIGN.md §7). Banding partitions the variant axis into
    ``n_bands`` contiguous ranges; each band's calls are laid out
    band-major (band 0's chunks for every tile, then band 1's, …) so the
    per-band gather runs against a small static table slice, while the
    kernel walks a (super_tile, band) grid accumulating into the same
    logits block. ``vid`` holds BAND-LOCAL variant ids; ``band_edges[k]``
    is the first variant of band k.
    """

    vid: np.ndarray  # i32 [n_chunks * TC], local to the call's band
    seg_group: np.ndarray  # i32 [1, n_chunks * GPC]
    q: np.ndarray  # f32 [1, n_chunks * TC]
    chunk2tile: np.ndarray  # i32 [n_chunks]
    band_chunk_offsets: np.ndarray  # i64 [n_bands + 1] chunk index of each band's region
    band_edges: np.ndarray  # i64 [n_bands + 1] variant ranges
    n_barcodes: int
    n_tiles: int
    tile_barcodes: int
    chunk_calls: int
    n_bands: int

    @property
    def n_chunks(self) -> int:
        return len(self.chunk2tile)

    @property
    def group(self) -> int:
        return chunk_group(self.chunk_calls)

    @property
    def groups_per_chunk(self) -> int:
        return self.chunk_calls // self.group


def tile_barcode_calls_banded(
    cb_sorted: np.ndarray,
    vid_sorted: np.ndarray,
    q_sorted: np.ndarray,
    n_barcodes: int,
    n_variants: int,
    n_bands: int,
    tile_barcodes: int = 32,
    chunk_calls: int = 512,
) -> BandedTiledCalls:
    """Band-major tiled layout; n_bands=1 degenerates to one full band.

    Product-scale builds take the fused C++ path (one threaded counts pass +
    one threaded scatter pass, ``native/hostops.cpp``); the per-band numpy
    loop below is its bit-identical semantic definition and the fallback
    (forced-fallback parity pinned by tests/test_native_hostops.py).
    """
    TB, TC = tile_barcodes, chunk_calls
    edges = np.linspace(0, n_variants, n_bands + 1).astype(np.int64)

    native = _banded_native_build(
        cb_sorted, vid_sorted, q_sorted, n_barcodes, n_variants, edges,
        n_bands, TB, TC,
    )
    if native is not None:
        return native

    band_of_call = np.searchsorted(edges, vid_sorted, side="right") - 1
    np.clip(band_of_call, 0, n_bands - 1, out=band_of_call)

    parts = []
    for k in range(n_bands):
        sel = band_of_call == k
        parts.append(
            tile_barcode_calls(
                cb_sorted[sel], (vid_sorted[sel] - edges[k]).astype(np.int32),
                q_sorted[sel], n_barcodes, tile_barcodes=TB, chunk_calls=TC,
            )
        )

    band_chunk_offsets = np.concatenate(
        [[0], np.cumsum([p.n_chunks for p in parts])]
    ).astype(np.int64)
    return BandedTiledCalls(
        vid=np.concatenate([p.vid for p in parts]),
        seg_group=np.concatenate([p.seg_group for p in parts], axis=1),
        q=np.concatenate([p.q for p in parts], axis=1),
        chunk2tile=np.concatenate([p.chunk2tile for p in parts]),
        band_chunk_offsets=band_chunk_offsets,
        band_edges=edges,
        n_barcodes=n_barcodes,
        n_tiles=parts[0].n_tiles,
        tile_barcodes=TB,
        chunk_calls=TC,
        n_bands=n_bands,
    )


def _banded_native_build(
    cb_sorted, vid_sorted, q_sorted, n_barcodes, n_variants, edges,
    n_bands, TB, TC,
) -> BandedTiledCalls | None:
    """Fused native banded layout build, or None for the numpy path.

    The offset arithmetic below reproduces :func:`tile_barcode_calls` per
    band exactly — per-(band, barcode) group padding to G, per-(band, tile)
    rounding to whole chunks with a 1-chunk floor, band-major chunk order —
    so the result is bit-identical to the per-band fallback.
    """
    from ..native.hostops import band_counts, tile_scatter_banded

    G = chunk_group(TC)
    n_tiles = max(1, -(-n_barcodes // TB))
    nb_pad = n_tiles * TB

    # band membership lookup per variant (lut[vid] == the fallback's
    # clipped searchsorted on the call's vid)
    band_lut = np.clip(
        np.searchsorted(edges, np.arange(max(n_variants, 1)), side="right") - 1,
        0, n_bands - 1,
    ).astype(np.int32)
    counts = band_counts(cb_sorted, vid_sorted, band_lut, nb_pad, n_bands)
    if counts is None:
        return None

    padded = -(-counts // G) * G  # [n_bands, nb_pad], group-aligned slots
    tile_slots = padded.reshape(n_bands, n_tiles, TB).sum(axis=2)
    chunks_per_tile = np.maximum(1, -(-tile_slots // TC))  # [n_bands, n_tiles]
    band_nchunks = chunks_per_tile.sum(axis=1)
    band_chunk_offsets = np.concatenate([[0], np.cumsum(band_nchunks)]).astype(np.int64)
    n_chunks = int(band_chunk_offsets[-1])

    # global band-major chunk index of each (band, tile)'s first chunk
    chunk_start = np.cumsum(chunks_per_tile.reshape(-1))
    chunk_start = np.concatenate([[0], chunk_start[:-1]]).reshape(n_bands, n_tiles)

    # slot offset of each (band, barcode) within its tile's call stream
    slot_cum = np.concatenate(
        [np.zeros((n_bands, 1), np.int64), np.cumsum(padded, axis=1)], axis=1
    )
    tile_of_b = np.arange(nb_pad, dtype=np.int64) // TB
    b_offset = slot_cum[:, :-1] - slot_cum[:, tile_of_b * TB]

    GPC = TC // G
    vid = np.zeros(n_chunks * TC, dtype=np.int32)
    seg_group = np.zeros(n_chunks * GPC, dtype=np.int32)
    q = np.ones(n_chunks * TC, dtype=np.float32)
    if not tile_scatter_banded(
        cb_sorted, vid_sorted, q_sorted, band_lut, edges[:-1],
        b_offset, chunk_start, n_tiles, TB, TC, vid, q, seg_group,
    ):
        return None
    chunk2tile = np.concatenate([
        np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile[k])
        for k in range(n_bands)
    ])
    return BandedTiledCalls(
        vid=vid,
        seg_group=seg_group.reshape(1, -1),
        q=q.reshape(1, -1),
        chunk2tile=chunk2tile,
        band_chunk_offsets=band_chunk_offsets,
        band_edges=edges,
        n_barcodes=n_barcodes,
        n_tiles=n_tiles,
        tile_barcodes=TB,
        chunk_calls=TC,
        n_bands=n_bands,
    )


# Launch-grid step budget. This environment's remote Mosaic compile cost
# grows pathologically with grid size (CLAUDE.md): ~450 steps measured fine,
# 512+ can wedge the shared compiler service for ~10 minutes.
GRID_CAP = 448

# VMEM budget for one grid step's resident rows (logits / addition block).
# Larger budgets mean bigger super-tiles -> fewer grid steps -> more variant
# bands fit under GRID_CAP (each gather-table slice stays on the fast side
# of the cliff, docs/DESIGN.md §7). 5.4 MB keeps total VMEM use well under
# the 128 MB/core of v5e alongside the double-buffered call scratch.
SUPER_ROWS_BUDGET = int(os.environ.get("DEMUX_SUPER_ROWS_BUDGET", 5_400_000))


def check_kernel_budgets(kernel: str, vmem_bytes: int, n_grid_steps: int) -> None:
    """Fail fast on kernel shapes that cannot fly on the target hardware.

    Interpret-mode tests never see VMEM capacity or launch-grid limits, so
    an oversized shape would otherwise surface as a remote Mosaic failure
    (or a wedged shared compiler) at bench time. Raises ValueError (not
    assert — survives ``python -O``). Single source of truth for both
    kernels; the grid bound is GRID_CAP, the same budget the layout
    choosers size against.
    """
    # the hard limit is the compiler's SCOPED VMEM allocation (measured on
    # this stack: "Scoped allocation ... limit 16.00M" — NOT the 128 MB
    # architectural VMEM), which covers out blocks + scratch together
    if vmem_bytes >= 16_000_000:
        raise ValueError(
            f"{kernel} kernel VMEM estimate {vmem_bytes / 1e6:.1f} MB exceeds "
            "the 16 MB scoped-VMEM compiler limit; shrink the super-tile or "
            "chunk parameters"
        )
    if n_grid_steps > 2 * GRID_CAP:
        raise ValueError(
            f"{kernel} launch grid {n_grid_steps} exceeds 2x GRID_CAP={GRID_CAP} "
            "(grids this large wedge the remote Mosaic compiler)"
        )
    if n_grid_steps > GRID_CAP:
        # VMEM-constrained layouts can legitimately exceed the soft cap by a
        # little (e.g. ~16k barcode tiles at 640 padded pseudogenotypes);
        # warn loudly — compile time may be painful on shared compilers
        import sys

        print(
            f"# {kernel} launch grid {n_grid_steps} exceeds the soft cap "
            f"GRID_CAP={GRID_CAP}; expect slow Mosaic compiles",
            file=sys.stderr, flush=True,
        )


def choose_n_bands(n_variants: int, n_donors: int, table_budget_bytes: int = 17_000_000) -> int:
    """Variant bands so each gather table slice stays under the fast-path size.

    Measured on v5e (benchmarks/exp_gather harnesses): the gather is
    index-count bound (~2.6 ns/row) for tables up to ~17 MB — banding below
    that size buys nothing and costs chunk padding — while at the PMBC
    SNP-array scale (84 MB table) unbanded gathers degrade ~10x, so bands
    sized to ≤17 MB slices stay on the flat part of the curve.
    """
    table_bytes = n_variants * n_donors * 4
    return max(1, -(-table_bytes // table_budget_bytes))


def cap_bands_to_grid(
    n_bands: int,
    n_tiles: int,
    tile_rows: int,
    block_cols: int,
    max_super_rows_bytes: int | None = None,
) -> int:
    """Largest band count keeping the (super_tile, band) grid under GRID_CAP.

    The VMEM budget bounds how many tiles one grid step can absorb
    (``tile_rows`` rows per tile, a resident block of ``block_cols`` f32
    lanes per row), which floors the super-tile count; the band count then
    caps at GRID_CAP / that floor. Fewer bands mean larger gather-table
    slices — a throughput trade, never a correctness one.
    """
    if max_super_rows_bytes is None:
        max_super_rows_bytes = SUPER_ROWS_BUDGET
    max_rows = max(tile_rows, (max_super_rows_bytes // 4) // block_cols)
    vmem_sps = max(1, max_rows // tile_rows)
    n_super_floor = -(-max(n_tiles, 1) // vmem_sps)
    return max(1, min(n_bands, GRID_CAP // max(1, n_super_floor)))


def choose_chunk_calls_from_counts(
    counts: np.ndarray,
    tile_barcodes: int,
    max_chunk_calls: int = 4096,
    gather_ns_per_slot: float = 2.1,
    chunk_overhead_ns: float = 300.0,
) -> int:
    """Pick the E-step chunk size from the dataset's exact per-segment counts.

    Cost model (both constants measured on v5e, BASELINE.md round 3): every
    padded slot costs one gather-engine index (~2.1 ns) and every chunk
    costs fixed inner-loop overhead (~0.3 µs of DMA bookkeeping + scalar
    control). Bigger chunks mean fewer chunks but coarser padding — each
    segment pads to whole groups of G = tc/128 and each tile to whole
    chunks — so the trade depends on the data's skew: the uniform bench sim
    rewards tc = 4096 (measured E-step 17.6 → 16.7 ms), while heavy-tailed
    real data pads too much there. The slot arithmetic below reproduces
    :func:`tile_barcode_calls` exactly, so the choice tracks the dataset
    instead of assuming uniform fill.
    """
    tb = max(1, tile_barcodes)
    n_tiles = max(1, -(-len(counts) // tb))
    counts = np.asarray(counts, dtype=np.int64)
    if len(counts) < n_tiles * tb:
        counts = np.pad(counts, (0, n_tiles * tb - len(counts)))
    best_tc, best_cost = 128, None
    tc = 128
    while tc <= max(128, max_chunk_calls):
        g = chunk_group(tc)
        padded = -(-counts // g) * g
        tile_slots = padded.reshape(n_tiles, tb).sum(axis=1)
        n_chunks = int(np.maximum(1, -(-tile_slots // tc)).sum())
        cost = n_chunks * tc * gather_ns_per_slot + n_chunks * chunk_overhead_ns
        if best_cost is None or cost < best_cost:
            best_tc, best_cost = tc, cost
        tc *= 2
    return best_tc


def choose_banded_chunk_calls(
    n_calls: int, n_tiles: int, n_bands: int, chunk_calls: int, seg_rows: int = 0
) -> int:
    """Chunk size minimizing estimated padded slots per (tile, band) region.

    Banding splits each tile's calls ``n_bands`` ways, so a full-size chunk
    would be mostly padding — but shrinking the chunk also shrinks the group
    G = tc // 128, and each segment (barcode / variant row) pads to whole
    groups: the two padding sources trade against each other. With
    ``seg_rows`` (segments per tile) the estimate per (tile, band) region is
    ``mean_fill + seg_rows·(G−1)/2`` rounded up to whole chunks; candidates
    are the 128-multiples up to ``chunk_calls``, near-ties going to the
    larger chunk (fewer DMAs per super-tile). ``seg_rows = 0`` keeps the
    legacy mean-fill rule. Deterministic across processes: uses only
    allgather-agreed scalars. Single source of truth for the E-step,
    M-step, and sharded layouts.
    """
    mean_fill = n_calls / max(n_tiles * n_bands, 1)
    if seg_rows <= 0:
        return int(np.clip(round(mean_fill * 1.15 / 128) * 128, 128, chunk_calls))
    best_tc, best_key = 128, None
    for tc in range(128, max(chunk_calls, 128) + 1, 128):
        g = chunk_group(tc)
        est = mean_fill + seg_rows * (g - 1) / 2
        slots = max(1, -(-int(np.ceil(est)) // tc)) * tc
        key = slots * (1.0 - 0.02 * tc / chunk_calls)
        if best_key is None or key < best_key:
            best_tc, best_key = tc, key
    return best_tc


def banded_chunk_counts(
    cb_sorted: np.ndarray,
    vid_sorted: np.ndarray,
    n_barcodes_per_shard: int,
    n_variants: int,
    n_shards: int,
    n_bands: int,
    tile_barcodes: int,
    chunk_calls: int,
) -> np.ndarray:
    """Chunks each (shard, band) region needs ([n_shards, n_bands] int64).

    Cheap pre-pass (one bincount over the calls) so multi-host layouts can
    agree on per-band chunk widths before any array is built. Mirrors the
    real layout exactly, including per-segment group padding (each
    barcode's calls round up to multiples of G = TC/128).
    """
    G = chunk_group(chunk_calls)
    n_tiles = n_barcodes_per_shard // tile_barcodes
    edges = np.linspace(0, n_variants, n_bands + 1).astype(np.int64)
    band = np.clip(np.searchsorted(edges, vid_sorted, side="right") - 1, 0, n_bands - 1)
    shard = cb_sorted.astype(np.int64) // n_barcodes_per_shard
    local_b = cb_sorted.astype(np.int64) % n_barcodes_per_shard
    key = (shard * n_bands + band) * n_barcodes_per_shard + local_b
    per_barcode = np.bincount(key, minlength=n_shards * n_bands * n_barcodes_per_shard)
    padded = -(-per_barcode // G) * G
    per_tile = padded.reshape(n_shards, n_bands, n_tiles, tile_barcodes).sum(axis=3)
    chunks = np.maximum(1, -(-per_tile // chunk_calls))
    return chunks.sum(axis=2)


def choose_subtiles_per_super(
    n_tiles: int,
    n_chunks: int,
    tile_barcodes: int,
    pgp: int,
    max_super_rows_bytes: int | None = None,
    n_bands: int = 1,
) -> int:
    """Super-tile grouping: VMEM row budget + balanced chunk spans per step.

    Also enforces the launch-grid budget: the grid is (n_super, n_bands),
    so subtiles-per-super is raised (VMEM permitting) until
    ``n_super * n_bands <= GRID_CAP``. Single source of truth for the
    single-device and sharded layouts.
    """
    from .pallas_likelihood import MAX_CHUNKS_PER_SUPER

    if max_super_rows_bytes is None:
        max_super_rows_bytes = SUPER_ROWS_BUDGET
    max_rows = max(tile_barcodes, (max_super_rows_bytes // 4) // pgp)
    vmem_sps = max(1, max_rows // tile_barcodes)
    n_super_min = -(-n_chunks // MAX_CHUNKS_PER_SUPER)
    sps = min(vmem_sps, max(1, n_tiles // max(1, n_super_min)))
    grid_sps = -(-n_tiles // max(1, GRID_CAP // max(n_bands, 1)))
    sps = max(sps, min(grid_sps, vmem_sps))
    return min(sps, n_tiles)


@dataclass
class ShardedTiledCalls:
    """Per-shard tiled layouts with identical static dims (stacked on axis 0).

    Shard s owns barcodes [s·Bp, (s+1)·Bp); its calls are tiled like
    :func:`tile_barcode_calls` with chunk counts padded to the max across
    shards (padding chunks attach to the last super-tile and carry q=1, an
    exact no-op), so every shard runs the same kernel shape under shard_map.

    With ``n_bands > 1`` each shard's layout is variant-banded
    (:class:`BandedTiledCalls`); every band region is padded to the same
    chunk width on every shard so the per-band gather slices
    (``band_specs``) stay static under shard_map.
    """

    vid: np.ndarray  # i32 [S, n_chunks * TC]
    seg_group: np.ndarray  # i32 [S, 1, n_chunks * GPC]
    q: np.ndarray  # f32 [S, 1, n_chunks * TC]
    chunk_bounds: np.ndarray  # i32 [S, n_bands * (n_super + 1)]
    chunk_suboff: np.ndarray  # i32 [S, n_chunks]
    n_barcodes: int
    n_barcodes_per_shard: int
    n_shards: int
    n_super: int
    tbs: int
    tile_barcodes: int
    chunk_calls: int
    n_chunks: int
    band_specs: tuple = ()  # static ((v_lo, v_hi, c_lo, c_hi), ...) or () = 1 band


def tile_barcode_calls_sharded(
    cb_sorted: np.ndarray,
    vid_sorted: np.ndarray,
    q_sorted: np.ndarray,
    n_barcodes: int,
    n_shards: int,
    tile_barcodes: int = 32,
    chunk_calls: int = 512,
    subtiles_per_super: int = 0,
    max_super_rows_bytes: int | None = None,
    pgp: int = 640,
    barcodes_per_shard: int = 0,
    shard_ids=None,
    n_chunks_floor: int = 0,
    n_variants: int = 0,
    n_bands: int = 1,
    band_width_floors=None,
) -> ShardedTiledCalls:
    """Shard barcode-sorted calls by barcode range, tiling each shard.

    ``shard_ids`` limits array building to those shards (stacked in the
    given order) — multi-host callers pass their local shard positions and
    force cross-process-agreed ``n_chunks_floor`` (or, when banded,
    per-band ``band_width_floors``) so static kernel dims match on every
    process.
    ``n_bands > 1`` variant-bands every shard's layout (gather fast path,
    docs/DESIGN.md §7) with identical band chunk regions on every shard.
    """
    TB, TC = tile_barcodes, chunk_calls
    if barcodes_per_shard <= 0:
        barcodes_per_shard = -(-max(n_barcodes, n_shards) // (n_shards * TB)) * TB
    per_shard_b = barcodes_per_shard
    assert per_shard_b % TB == 0, "barcodes_per_shard must be a multiple of tile_barcodes"
    n_tiles = per_shard_b // TB
    if shard_ids is None:
        shard_ids = list(range(n_shards))

    shard_of_call = cb_sorted // per_shard_b
    shard_bounds = np.searchsorted(shard_of_call, np.arange(n_shards + 1))

    if n_bands > 1:
        return _sharded_banded(
            cb_sorted, vid_sorted, q_sorted, shard_bounds, shard_ids,
            n_barcodes=n_barcodes, per_shard_b=per_shard_b, n_shards=n_shards,
            n_tiles=n_tiles, n_variants=n_variants, n_bands=n_bands, TB=TB, TC=TC,
            subtiles_per_super=subtiles_per_super, pgp=pgp,
            max_super_rows_bytes=max_super_rows_bytes,
            band_width_floors=band_width_floors,
        )

    per_shard = []
    for s in shard_ids:
        lo, hi = shard_bounds[s], shard_bounds[s + 1]
        local = tile_barcode_calls(
            cb_sorted[lo:hi] - s * per_shard_b,
            vid_sorted[lo:hi],
            q_sorted[lo:hi],
            per_shard_b,
            tile_barcodes=TB,
            chunk_calls=TC,
        )
        per_shard.append(local)

    n_chunks = max(max(t.n_chunks for t in per_shard), n_chunks_floor)

    if subtiles_per_super <= 0:
        subtiles_per_super = choose_subtiles_per_super(
            n_tiles, n_chunks, TB, pgp, max_super_rows_bytes
        )
    n_super = -(-n_tiles // subtiles_per_super)
    tbs = TB * subtiles_per_super
    n_blocks = len(per_shard)
    GPC = TC // chunk_group(TC)
    vid = np.zeros((n_blocks, n_chunks * TC), np.int32)
    seg_group = np.zeros((n_blocks, 1, n_chunks * GPC), np.int32)
    q = np.ones((n_blocks, 1, n_chunks * TC), np.float32)
    chunk_bounds = np.zeros((n_blocks, n_super + 1), np.int32)
    chunk_suboff = np.zeros((n_blocks, n_chunks), np.int32)

    for s, local in enumerate(per_shard):
        m = local.n_chunks
        vid[s, : m * TC] = local.vid
        seg_group[s, 0, : m * GPC] = local.seg_group[0]
        q[s, 0, : m * TC] = local.q[0]
        chunks_per_tile = np.bincount(local.chunk2tile, minlength=n_tiles)
        tile_starts = np.concatenate([[0], np.cumsum(chunks_per_tile)])
        bounds = tile_starts[::subtiles_per_super].tolist()
        if len(bounds) < n_super + 1 or bounds[-1] != m:
            bounds = (bounds + [m] * (n_super + 1))[: n_super + 1]
        # padding chunks attach to the last super-tile (q=1 rows, no-ops)
        bounds[-1] = n_chunks
        chunk_bounds[s] = bounds
        chunk_suboff[s, :m] = local.chunk2tile % subtiles_per_super
        # padded chunks keep suboff 0 (their calls contribute nothing)

    return ShardedTiledCalls(
        vid=vid, seg_group=seg_group, q=q,
        chunk_bounds=chunk_bounds, chunk_suboff=chunk_suboff,
        n_barcodes=n_barcodes,
        n_barcodes_per_shard=per_shard_b,
        n_shards=n_shards,
        n_super=n_super,
        tbs=tbs,
        tile_barcodes=TB,
        chunk_calls=TC,
        n_chunks=n_chunks,
    )


def _sharded_banded(
    cb_sorted, vid_sorted, q_sorted, shard_bounds, shard_ids, *,
    n_barcodes, per_shard_b, n_shards, n_tiles, n_variants, n_bands, TB, TC,
    subtiles_per_super, pgp, max_super_rows_bytes, band_width_floors,
):
    """Banded variant of the sharded layout: agreed per-band chunk widths."""
    per_shard = []
    for s in shard_ids:
        lo, hi = shard_bounds[s], shard_bounds[s + 1]
        per_shard.append(
            tile_barcode_calls_banded(
                cb_sorted[lo:hi] - s * per_shard_b,
                vid_sorted[lo:hi],
                q_sorted[lo:hi],
                per_shard_b,
                n_variants=n_variants,
                n_bands=n_bands,
                tile_barcodes=TB,
                chunk_calls=TC,
            )
        )

    # each band's region padded to its own width, agreed across shards (and,
    # for multi-host, across processes via allgathered band_width_floors)
    widths = np.zeros(n_bands, dtype=np.int64)
    if band_width_floors is not None:
        widths[:] = np.asarray(band_width_floors, dtype=np.int64)
    for t in per_shard:
        widths = np.maximum(widths, np.diff(t.band_chunk_offsets))
    dst_offsets = np.concatenate([[0], np.cumsum(widths)]).astype(np.int64)
    n_chunks = int(dst_offsets[-1])

    if subtiles_per_super <= 0:
        subtiles_per_super = choose_subtiles_per_super(
            n_tiles, int(widths.max()), TB, pgp, max_super_rows_bytes,
            n_bands=n_bands,
        )
    n_super = -(-n_tiles // subtiles_per_super)
    tbs = TB * subtiles_per_super
    n_blocks = len(per_shard)
    GPC = TC // chunk_group(TC)
    vid = np.zeros((n_blocks, n_chunks * TC), np.int32)
    seg_group = np.zeros((n_blocks, 1, n_chunks * GPC), np.int32)
    q = np.ones((n_blocks, 1, n_chunks * TC), np.float32)
    chunk_bounds = np.zeros((n_blocks, n_bands * (n_super + 1)), np.int32)
    chunk_suboff = np.zeros((n_blocks, n_chunks), np.int32)

    for i, t in enumerate(per_shard):
        for k in range(n_bands):
            c_lo = int(t.band_chunk_offsets[k])
            c_hi = int(t.band_chunk_offsets[k + 1])
            m = c_hi - c_lo
            dst = int(dst_offsets[k])
            vid[i, dst * TC : (dst + m) * TC] = t.vid[c_lo * TC : c_hi * TC]
            seg_group[i, 0, dst * GPC : (dst + m) * GPC] = t.seg_group[0, c_lo * GPC : c_hi * GPC]
            q[i, 0, dst * TC : (dst + m) * TC] = t.q[0, c_lo * TC : c_hi * TC]
            chunks_per_tile = np.bincount(t.chunk2tile[c_lo:c_hi], minlength=n_tiles)
            starts = dst + np.concatenate([[0], np.cumsum(chunks_per_tile)])
            bounds = starts[::subtiles_per_super].tolist()
            if len(bounds) < n_super + 1 or bounds[-1] != dst + m:
                bounds = (bounds + [dst + m] * (n_super + 1))[: n_super + 1]
            # padding chunks attach to the band's last super-tile (q=1 no-ops)
            bounds[-1] = dst + int(widths[k])
            chunk_bounds[i, k * (n_super + 1) : (k + 1) * (n_super + 1)] = bounds
            chunk_suboff[i, dst : dst + m] = t.chunk2tile[c_lo:c_hi] % subtiles_per_super

    edges = per_shard[0].band_edges
    band_specs = tuple(
        (int(edges[k]), int(edges[k + 1]), int(dst_offsets[k]), int(dst_offsets[k + 1]))
        for k in range(n_bands)
    )
    return ShardedTiledCalls(
        vid=vid, seg_group=seg_group, q=q,
        chunk_bounds=chunk_bounds, chunk_suboff=chunk_suboff,
        n_barcodes=n_barcodes,
        n_barcodes_per_shard=per_shard_b,
        n_shards=n_shards,
        n_super=n_super,
        tbs=tbs,
        tile_barcodes=TB,
        chunk_calls=TC,
        n_chunks=n_chunks,
        band_specs=band_specs,
    )
