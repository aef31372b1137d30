"""Fused Pallas TPU kernel for the EM M-step sufficient statistics.

Computes ``addition[v, g] = Σ_{calls c with variant v} (post[cb_c, g]·(1−q_c))^p``
(singlet posterior columns only; reference hot loop demuxalot/demux.py:113-118)
without the XLA gather→power→scatter chain and its [n_calls, n_donors] HBM
round-trips.

Mirror of the likelihood kernel, including its super-tile grouping: each
grid step owns SPS variant tiles of TV variants (a resident [D, SPS·TV]
block), so the launch grid stays under the compile-friendly cap at any
variant count; each chunk's scatter-matmul lands on its tile's column
slice via a scalar-prefetched sub-tile offset:

    per grid step (one super-tile of SPS·TV variants):
      out[D, SPS·TV] = 0
      for each call chunk of the super-tile (inner fori_loop, DMA'd):
        w   = (postᵀ[chunk]·(1−q))^p                  # [D, TC], VPU
        out[:, off·TV : +TV] += w · onehot(v_local)ᵀ  # [D, TV]  MXU

Output is produced donor-major [D, n_variants] and transposed once by XLA.
Calls arrive sorted by variant and padded per TV-variant tile
(ops/tiling.py layout, segment axis = variants); padding rows carry q = 1 →
weight 0, an exact no-op.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..native.hostops import stable_argsort, take3
from .pallas_likelihood import (
    KERNEL_PRECISION, _SPLIT_WORDS, dot_words, stage_chunks,
)

LANE = 128


def resolve_fold_power() -> bool:
    """Read DEMUX_MSTEP_FOLD *now* (outside any jit trace).

    ``tiled_mstep_impl`` is usually called under a jit with fold_power as a
    static argument; resolving the env var inside the traced body would
    freeze its first-seen value into the compilation cache. Callers that
    want the env override honored per call must resolve it eagerly (as
    :meth:`TiledMstepCalls.addition` does) and pass the concrete bool.
    """
    return os.environ.get("DEMUX_MSTEP_FOLD", "1") != "0"


def _mstep_kernel(
    bounds_ref,  # SMEM scalar prefetch [n_bands * (n_super + 1)]: chunk ranges
    suboff_ref,  # SMEM scalar prefetch [n_chunks]: variant tile within super-tile
    wt_hbm,  # ANY [D, n_chunks*TC] gathered singlet posteriors (call-major lanes)
    vl_hbm,  # ANY [1, n_chunks*GPC] variant index within tile per group
    q_hbm,  # ANY [1, n_chunks*TC] q — or (1−q)^p pre-folded when fold_power
    out_ref,  # VMEM [D, SPS*TV] — this super-tile's block (resident across bands)
    wt_buf,  # VMEM scratch [2, D, SB*TC] staged DMA blocks (SB = 1 by default)
    vl_buf,  # VMEM scratch [2, 1, SB*GPC]
    q_buf,  # VMEM scratch [2, 1, SB*TC]
    wt_sem,  # DMA sems [2]
    vl_sem,
    q_sem,
    *,
    tv: int,
    tc: int,
    power: float,
    n_words: int,
    n_super: int,
    fold_power: bool = False,
):
    group = max(1, tc // 128)
    gpc = tc // group
    sb = stage_chunks(tc)  # chunks per staged DMA block (pallas_likelihood)
    s = pl.program_id(0)
    band = pl.program_id(1)  # fastest axis: the super-tile's block stays resident
    at = band * (n_super + 1) + s
    lo = bounds_ref[at]
    hi = bounds_ref[at + 1]
    n = hi - lo

    # staged DMA: SB chunks per transfer (the DMA engine is issue-rate
    # bound, benchmarks/exp_dma_pattern.py); blocks may overrun into the
    # next region's columns (valid, unread) and the launcher pads the
    # global tail with SB-1 inert chunks.
    def dmas(slot, blk):
        base = lo + blk * sb
        return (
            pltpu.make_async_copy(
                wt_hbm.at[:, pl.ds(base * tc, sb * tc)], wt_buf.at[slot], wt_sem.at[slot]
            ),
            pltpu.make_async_copy(
                vl_hbm.at[:, pl.ds(base * gpc, sb * gpc)], vl_buf.at[slot], vl_sem.at[slot]
            ),
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(base * tc, sb * tc)], q_buf.at[slot], q_sem.at[slot]
            ),
        )

    @pl.when(band == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(n > 0)
    def _warmup():
        for d in dmas(0, 0):
            d.start()

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)

        @pl.when((blk + 1) * sb < n)
        def _prefetch():
            for d in dmas(jax.lax.rem(blk + 1, 2), blk + 1):
                d.start()

        for d in dmas(slot, blk):
            d.wait()

        # static unroll over the block's chunks: dynamic lane offsets into
        # the staging buffer measured SLOWER than the staged DMA saves, so
        # every chunk slice below is compile-time constant (only the slot
        # index and the validity predicate are dynamic)
        for k in range(sb):
            ci = blk * sb + k

            @pl.when(ci < n)
            def _chunk(k=k, ci=ci):
                wt = wt_buf[slot, :, k * tc : (k + 1) * tc]  # [D, TC]
                q = q_buf[slot, 0, k * tc : (k + 1) * tc]
                if fold_power:
                    # integer-power fast path: the table arrives pre-raised
                    # (posterior^p) and the q stream carries (1−q)^p with
                    # padding rows already exactly 0 — one VPU multiply, no
                    # power ladder, no padding select
                    w = wt * q[None, :]  # [D, TC]
                else:
                    w = wt * (1.0 - q)[None, :]
                    # padding rows (q == 1) must stay exactly zero for any
                    # power; integer powers stay on the VPU multiply path (a
                    # float exponent would lower as exp/log transcendentals)
                    wp = w * w if power == 2.0 else (w if power == 1.0 else w**power)
                    w = jnp.where(q[None, :] >= 1.0, 0.0, wp)  # [D, TC]

                # per-group sums (each group is one variant's run of G
                # calls, ops/tiling.py): the scatter contracts GPC columns
                gw = w[:, 0:gpc]
                for j in range(1, group):
                    gw = gw + w[:, j * gpc : (j + 1) * gpc]  # [D, GPC]

                vl = vl_buf[slot, 0, k * gpc : (k + 1) * gpc]
                col_ids = jax.lax.broadcasted_iota(jnp.int32, (tv, gpc), 0)
                onehot = (col_ids == vl[None, :]).astype(jnp.float32)  # [TV, GPC]
                # one-hot is bf16-exact; gw carries the split words (see
                # pallas_likelihood.dot_words for the precision strategy).
                # TV is a multiple of 128: the lane slice stays tile-aligned
                off = pl.multiple_of(suboff_ref[lo + ci] * tv, tv)
                out_ref[:, pl.ds(off, tv)] += dot_words(
                    gw, onehot, ((1,), (1,)), n_words, split="a"
                )

        return 0

    jax.lax.fori_loop(0, jax.lax.div(n + sb - 1, sb), body, 0)


def tiled_mstep_impl(
    posterior,  # f32 [n_barcodes(+pad), n_pseudogenotypes]
    cb_global,  # i32 [n_chunks * TC] barcode per call, band-LOCAL when banded
    vl,  # i32 [1, n_chunks * GPC] variant index within tile per group
    q,  # f32 [1, n_chunks * TC]
    chunk_bounds,  # i32 [n_bands * (n_super + 1)]
    chunk_suboff,  # i32 [n_chunks] variant tile within super-tile
    *,
    n_variants: int,
    n_genotypes: int,
    tv: int,
    tc: int,
    sps: int,  # variant tiles per super-tile (grid step)
    contribution_power: float,
    band_specs: tuple = (),  # ((b_lo, b_hi, chunk_lo, chunk_hi), ...) static
    interpret: bool = False,
    donor_major_out: bool = False,
    fold_power: bool | None = None,
):
    """Trace-time kernel invocation (jit-free; usable inside shard_map).

    ``band_specs`` (optional) bands the BARCODE axis: each band's calls are
    gathered against only its posterior slice, keeping the gather table
    under the fast-path size (docs/DESIGN.md §7); the kernel walks a
    (super_tile, band) grid accumulating into the resident block.

    ``donor_major_out=True`` returns [D, n_variants] — the kernel's native
    layout and what the E-step gather consumes — skipping the full-table
    transpose, which EM loops would otherwise pay every iteration.
    """
    n_chunks = q.shape[1] // tc
    if not band_specs:
        band_specs = ((0, posterior.shape[0], 0, n_chunks),)
    n_bands = len(band_specs)
    n_super = chunk_bounds.shape[0] // n_bands - 1

    if fold_power is None:
        fold_power = resolve_fold_power()
    # p <= 0 would turn the q = 1 padding rows into 1s instead of 0s
    fold_power = fold_power and contribution_power > 0

    if fold_power:
        # fold the contribution power into the XLA side: the table is
        # raised per band AFTER the singlet slice (one [band, D]
        # elementwise pass in total, fused) instead of every gathered call
        # row, and q carries (1−q)^p — padding rows (q = 1) land on
        # exactly 0 — so the kernel's per-chunk work collapses to one
        # multiply. Same math up to f32 rounding: (x·y)^p = x^p·y^p.
        q = (1.0 - q) ** contribution_power

    # stage slack: the kernel's staged DMA may read up to SB-1 chunks past
    # the last real chunk (pallas_likelihood.STAGE_COLS). Pad the INDEX
    # stream before the gather — the gather then emits the slack columns in
    # its own pass (padding wt itself would copy the whole stream). Slack
    # weights are never read by compute (beyond every region's hi), and the
    # padded q keeps its fold variant's inert value anyway.
    gpc = tc // max(1, tc // 128)
    sb = stage_chunks(tc)
    slack = (sb - 1) * tc
    if slack:
        cb_global = jnp.pad(jnp.asarray(cb_global), (0, slack))
        q = jnp.pad(
            jnp.asarray(q), ((0, 0), (0, slack)),
            constant_values=0.0 if fold_power else 1.0,
        )
        vl = jnp.pad(jnp.asarray(vl), ((0, 0), (0, (sb - 1) * gpc)))

    # slice the singlet columns BEFORE gathering: XLA does not fuse the
    # slice into the gather, and full-row gathering measured ~1000x slower.
    # Band slices cut contiguous posterior ROWS before the transpose so the
    # transpose-gather fusion pattern stays intact.
    wt_parts = []
    for i, (b_lo, b_hi, c_lo, c_hi) in enumerate(band_specs):
        table = jax.lax.slice_in_dim(posterior, b_lo, b_hi, axis=0)[:, :n_genotypes]
        if fold_power:
            table = table**contribution_power
        hi_cols = c_hi * tc + (slack if i == n_bands - 1 else 0)
        cb_k = jax.lax.slice_in_dim(cb_global, c_lo * tc, hi_cols, axis=0)
        wt_parts.append(table.T[:, cb_k])
    wt = wt_parts[0] if n_bands == 1 else jnp.concatenate(wt_parts, axis=1)
    # Mosaic DMA slices need 8-aligned sublane extents: pad the donor axis
    # (zero posterior rows produce zero contributions)
    d = -(-n_genotypes // 8) * 8
    if d != n_genotypes:
        wt = jnp.pad(wt, ((0, d - n_genotypes), (0, 0)))

    from .tiling import check_kernel_budgets

    check_kernel_budgets(
        "M-step",
        2 * d * sps * tv * 4  # addition block (pipeline-double-buffered)
        # double-buffered SB-chunk staging blocks
        + 2 * d * sb * tc * 4 + 2 * sb * gpc * 4 + 2 * sb * tc * 4,
        n_super * n_bands,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((d, sps * tv), lambda s, k, *_: (0, s)),
        scratch_shapes=[
            pltpu.VMEM((2, d, sb * tc), jnp.float32),
            pltpu.VMEM((2, 1, sb * gpc), jnp.int32),
            pltpu.VMEM((2, 1, sb * tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _mstep_kernel, tv=tv, tc=tc, power=contribution_power,
        n_words=_SPLIT_WORDS[KERNEL_PRECISION], n_super=n_super,
        fold_power=fold_power,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n_super * sps * tv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * 2 * d * tc * tv,
            bytes_accessed=wt.size * 4 + n_super * sps * d * tv * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bounds, chunk_suboff, wt, vl, q)
    block = out[:n_genotypes, :n_variants]
    return block if donor_major_out else block.T  # [n_variants, D] by default


_tiled_mstep = functools.partial(
    jax.jit,
    static_argnames=(
        "n_variants", "n_genotypes", "tv", "tc", "sps", "contribution_power",
        "band_specs", "interpret", "donor_major_out", "fold_power",
    ),
)(tiled_mstep_impl)


def choose_tile_variants(n_calls_max: int, n_variants: int, chunk_calls: int = 512) -> int:
    """Variant-tile width keeping every grid step under the chunk soft cap."""
    from .pallas_likelihood import MAX_CHUNKS_PER_SUPER

    n_chunks_est = max(1, -(-max(n_calls_max, 1) // chunk_calls))
    n_tiles_target = max(1, -(-n_chunks_est // MAX_CHUNKS_PER_SUPER))
    return max(128, min(512, (n_variants // n_tiles_target) // 128 * 128))


class ShardedMstepLayout:
    """Per-shard M-step layouts with identical static dims (stacked on axis 0).

    Each shard tiles its own calls over the (global) variant axis; barcode
    indices are shard-LOCAL so the kernel reads only the local posterior
    block inside shard_map. Chunk counts are padded to the max across shards
    (padding attaches to the last tile, q = 1 rows are no-ops).
    """

    def __init__(
        self,
        cb_local: np.ndarray,  # i32 [n_calls] shard-local barcode per call
        vid: np.ndarray,  # i32 [n_calls]
        q: np.ndarray,  # f32 [n_calls]
        shard_of_call: np.ndarray,  # i32 [n_calls]
        n_shards: int,
        n_variants: int,
        tile_variants: int = 0,
        chunk_calls: int = 512,
        shard_ids=None,
        n_chunks_floor: int = 0,
        n_genotypes: int = 0,  # donor count, for VMEM block sizing (0 = conservative)
        n_barcodes_per_shard: int = 0,
    ):
        if shard_ids is None:
            shard_ids = list(range(n_shards))
        if n_barcodes_per_shard <= 0:
            # the banded tiler's barcode-axis lookup table must cover every
            # local barcode id even in the 1-band case
            n_barcodes_per_shard = int(cb_local.max()) + 1 if len(cb_local) else 1
        if tile_variants <= 0:
            # multi-host callers must pass an agreed tile_variants; this
            # local estimate is only deterministic within one process
            tile_variants = choose_tile_variants(
                max(
                    (int(np.sum(shard_of_call == s)) for s in shard_ids), default=1
                ),
                n_variants, chunk_calls,
            )
        per_shard = []
        for s in shard_ids:
            sel = shard_of_call == s
            order = stable_argsort(vid[sel])
            per_shard.append(
                TiledMstepCalls(
                    *take3(order, vid[sel], cb_local[sel], q[sel]),
                    n_variants, tile_variants=tile_variants, chunk_calls=chunk_calls,
                    n_genotypes=n_genotypes, n_barcodes=n_barcodes_per_shard,
                )
            )

        n_chunks = max(max(t.n_chunks for t in per_shard), n_chunks_floor)
        # bounds are re-derived at one agreed super-tile grouping: all its
        # inputs are identical on every process (multi-host n_chunks equals
        # the allgathered floor, an upper bound on any shard's count)
        from .tiling import choose_subtiles_per_super

        n_tiles = per_shard[0].n_tiles
        d_pad = -(-max(n_genotypes, 64) // 8) * 8
        sps = choose_subtiles_per_super(n_tiles, n_chunks, tile_variants, d_pad)
        n_super = -(-n_tiles // sps)

        width = n_chunks * chunk_calls
        gpc = chunk_calls // max(1, chunk_calls // 128)
        n_blocks = len(per_shard)
        self.cb_global = np.zeros((n_blocks, width), np.int32)
        self.vl = np.zeros((n_blocks, 1, n_chunks * gpc), np.int32)
        self.q = np.ones((n_blocks, 1, width), np.float32)
        self.chunk_bounds = np.zeros((n_blocks, n_super + 1), np.int32)
        self.chunk_suboff = np.zeros((n_blocks, n_chunks), np.int32)
        for s, t in enumerate(per_shard):
            w = t.n_chunks * chunk_calls
            self.cb_global[s, :w] = np.asarray(t.cb_global)
            self.vl[s, 0, : t.n_chunks * gpc] = np.asarray(t.vl)[0]
            self.q[s, 0, :w] = np.asarray(t.q)[0]
            chunks_per_tile = np.bincount(t.chunk2tile, minlength=n_tiles)
            tile_starts = np.concatenate([[0], np.cumsum(chunks_per_tile)])
            bounds = tile_starts[::sps].tolist()
            if len(bounds) < n_super + 1 or bounds[-1] != t.n_chunks:
                bounds = (bounds + [t.n_chunks] * (n_super + 1))[: n_super + 1]
            # padding chunks attach to the last super-tile (q=1 rows, no-ops)
            bounds[-1] = n_chunks
            self.chunk_bounds[s] = bounds
            self.chunk_suboff[s, : t.n_chunks] = t.chunk2tile % sps

        self.n_variants = n_variants
        self.tile_variants = tile_variants
        self.chunk_calls = chunk_calls
        self.subtiles_per_super = sps
        self.n_super = n_super
        self.n_chunks = n_chunks


def choose_mstep_bands(n_barcodes: int, n_genotypes: int, table_budget_bytes: int = 24_000_000) -> int:
    """Barcode bands so each posterior gather slice stays under the fast path.

    Measured on v5e: a 16.8 MB posterior table (131k barcodes x 32 donors)
    still gathers at full rate — the budget sits above that, so banding
    only engages in the multi-hundred-k barcode regime where the cliff
    (docs/DESIGN.md §7) actually applies.
    """
    return max(1, -(-(n_barcodes * n_genotypes * 4) // table_budget_bytes))


class TiledMstepCalls:
    """Host layout for the M-step kernel: calls tiled on the variant axis.

    ``n_bands > 1`` additionally bands the BARCODE axis (mirror of the
    E-step's variant banding, docs/DESIGN.md §7): calls are laid out
    band-major with band-local barcode ids so every per-band posterior
    gather runs against a small table slice.
    """

    def __init__(
        self,
        variant_sorted_vid: np.ndarray,
        variant_sorted_cb: np.ndarray,
        variant_sorted_q: np.ndarray,
        n_variants: int,
        tile_variants: int = 0,
        chunk_calls: int = 512,
        n_barcodes: int = 0,
        n_bands: int = 1,
        n_genotypes: int = 0,  # donor count, for VMEM block sizing (0 = conservative)
        subtiles_per_super: int = 0,
    ):
        from .tiling import (
            cap_bands_to_grid,
            choose_banded_chunk_calls,
            choose_subtiles_per_super,
            tile_barcode_calls_banded,
        )

        if tile_variants <= 0:
            tile_variants = choose_tile_variants(
                len(variant_sorted_vid), n_variants, chunk_calls
            )
        n_tiles = -(-max(n_variants, 1) // tile_variants)
        d_pad = -(-max(n_genotypes, 64) // 8) * 8
        n_bands = cap_bands_to_grid(n_bands, n_tiles, tile_variants, d_pad)
        if n_bands > 1:
            assert n_barcodes > 0, "barcode banding needs n_barcodes"
            chunk_calls = choose_banded_chunk_calls(
                len(variant_sorted_vid), n_tiles, n_bands, chunk_calls,
                seg_rows=tile_variants,
            )

        # layout reuses the banded segment-tiling machinery with the axes
        # swapped: the segment (tiled) axis is VARIANTS, the banded payload
        # axis is BARCODES — so the returned ``vid`` slot carries band-local
        # barcodes and ``seg_group`` the within-tile variant index per group
        tiled = tile_barcode_calls_banded(
            variant_sorted_vid,
            variant_sorted_cb,
            variant_sorted_q,
            n_variants,
            n_variants=max(n_barcodes, 1),
            n_bands=n_bands,
            tile_barcodes=tile_variants,
            chunk_calls=chunk_calls,
        )

        if subtiles_per_super <= 0:
            max_band_chunks = int(np.diff(tiled.band_chunk_offsets).max())
            subtiles_per_super = choose_subtiles_per_super(
                tiled.n_tiles, max_band_chunks, tile_variants, d_pad,
                n_bands=n_bands,
            )
        n_super = -(-tiled.n_tiles // subtiles_per_super)

        bounds = []
        band_specs = []
        for k in range(n_bands):
            c_lo = int(tiled.band_chunk_offsets[k])
            c_hi = int(tiled.band_chunk_offsets[k + 1])
            chunks_per_tile = np.bincount(
                tiled.chunk2tile[c_lo:c_hi], minlength=tiled.n_tiles
            )
            tile_starts = c_lo + np.concatenate([[0], np.cumsum(chunks_per_tile)])
            band_bounds = tile_starts[::subtiles_per_super].tolist()
            if len(band_bounds) < n_super + 1 or band_bounds[-1] != c_hi:
                band_bounds = (band_bounds + [c_hi] * (n_super + 1))[: n_super + 1]
            assert len(band_bounds) == n_super + 1 and band_bounds[-1] == c_hi
            bounds.extend(band_bounds)
            band_specs.append(
                (int(tiled.band_edges[k]), int(tiled.band_edges[k + 1]), c_lo, c_hi)
            )

        # host copies; uploaded lazily (and only once) on first use
        self.cb_global = tiled.vid
        self.vl = tiled.seg_group
        self.q = tiled.q
        self.chunk_bounds = np.asarray(bounds, dtype=np.int32)
        self.chunk_suboff = (tiled.chunk2tile % subtiles_per_super).astype(np.int32)
        self.chunk2tile = tiled.chunk2tile  # ShardedMstepLayout re-derives bounds
        self.band_specs = tuple(band_specs) if n_bands > 1 else ()
        self._device_arrays = None
        self.n_variants = n_variants
        self.n_tiles = tiled.n_tiles
        self.tile_variants = tile_variants
        self.chunk_calls = chunk_calls
        self.subtiles_per_super = subtiles_per_super
        self.n_super = n_super
        self.n_chunks = tiled.n_chunks

    def _device(self):
        if self._device_arrays is None:
            self._device_arrays = tuple(
                jnp.asarray(x)
                for x in (self.cb_global, self.vl, self.q, self.chunk_bounds, self.chunk_suboff)
            )
        return self._device_arrays

    def addition(self, posterior, n_genotypes: int, contribution_power: float,
                 interpret: bool = False, donor_major_out: bool = False,
                 fold_power: bool | None = None):
        interpret = interpret or jax.default_backend() != "tpu"
        if fold_power is None:
            # resolve the env override OUTSIDE the jit: the impl's static
            # default would freeze the first-seen value into the cache
            fold_power = resolve_fold_power()
        cb_global, vl, q, chunk_bounds, chunk_suboff = self._device()
        return _tiled_mstep(
            posterior,
            cb_global,
            vl,
            q,
            chunk_bounds,
            chunk_suboff,
            n_variants=self.n_variants,
            n_genotypes=n_genotypes,
            tv=self.tile_variants,
            tc=self.chunk_calls,
            sps=self.subtiles_per_super,
            contribution_power=contribution_power,
            band_specs=self.band_specs,
            interpret=interpret,
            donor_major_out=donor_major_out,
            fold_power=fold_power,
        )
