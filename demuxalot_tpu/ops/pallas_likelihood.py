"""Fused Pallas TPU kernel for the likelihood accumulation.

Replaces the XLA chain gather → matmul → log → segment-sum, which round-trips
an [n_calls, n_pseudogenotypes] tensor through HBM (the dominant cost at
scale: ~2·N·PG·4 bytes per E-step). The kernel streams call chunks through
VMEM with double-buffered DMA and keeps each barcode tile's logits resident:

    per grid step (one *super-tile* of TB·SPS barcodes):
      out = penalties
      for each call chunk of the super-tile (inner fori_loop, DMA'd):
        P    = Gᵀ[chunk] · mixing                  # [TC, PG]  doublet expansion, MXU
        vals = log(P·(1−q) + max(q,1e-4))          # VPU
        out[subtile·TB : +TB] += onehot(cb_local)ᵀ · vals   # scatter-matmul, MXU

Calls are pre-sorted by barcode and padded per TB-barcode sub-tile
(ops/tiling.py); sub-tiles are grouped into super-tiles so the launch grid
stays small (one grid step per super-tile — important because this
environment's remote Mosaic compile cost grows with grid size). Chunk
bounds and chunk→sub-tile offsets arrive via scalar prefetch. Padding calls
carry q = 1 → log(1) = 0, an exact no-op.

Matmuls run at Precision.HIGHEST: default bf16 MXU rounding visibly
perturbs the accumulated logits.

Reference hot loop being replaced: demuxalot/demux.py:256-263.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import TiledCalls

LANE = 128
# soft cap on call chunks handled by one grid step; keeps per-step work and
# launch grids balanced (large grids once wedged this environment's remote
# Mosaic compile service)
MAX_CHUNKS_PER_SUPER = 160


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_pg(pg: int) -> int:
    """Lane-pad the pseudo-genotype axis to whole 128-lane tiles."""
    return _round_up(pg, LANE)


def _likelihood_kernel(
    bounds_ref,  # SMEM scalar prefetch [n_super + 1]: chunk ranges per super-tile
    suboff_ref,  # SMEM scalar prefetch [n_chunks]: sub-tile index within super-tile
    gt_hbm,  # ANY [D, n_chunks*TC] gathered genotype probs (call-major lanes)
    cbl_hbm,  # ANY [1, n_chunks*TC] local barcode index within sub-tile
    q_hbm,  # ANY [1, n_chunks*TC]
    mix_ref,  # VMEM [D, PGp]
    pen_ref,  # VMEM [1, PGp]
    out_ref,  # VMEM [TBS, PGp] — this super-tile's logits
    gt_buf,  # VMEM scratch [2, D, TC]
    cbl_buf,  # VMEM scratch [2, 1, TC]
    q_buf,  # VMEM scratch [2, 1, TC]
    gt_sem,  # DMA sems [2]
    cbl_sem,
    q_sem,
    *,
    tb: int,
    tc: int,
):
    s = pl.program_id(0)
    lo = bounds_ref[s]
    hi = bounds_ref[s + 1]
    n = hi - lo

    def dmas(slot, ci):
        base = (lo + ci) * tc
        return (
            pltpu.make_async_copy(gt_hbm.at[:, pl.ds(base, tc)], gt_buf.at[slot], gt_sem.at[slot]),
            pltpu.make_async_copy(cbl_hbm.at[:, pl.ds(base, tc)], cbl_buf.at[slot], cbl_sem.at[slot]),
            pltpu.make_async_copy(q_hbm.at[:, pl.ds(base, tc)], q_buf.at[slot], q_sem.at[slot]),
        )

    out_ref[:] = jnp.broadcast_to(pen_ref[0, :], out_ref.shape)

    @pl.when(n > 0)
    def _warmup():
        for d in dmas(0, 0):
            d.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)
        next_slot = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n)
        def _prefetch():
            for d in dmas(next_slot, ci + 1):
                d.start()

        for d in dmas(slot, ci):
            d.wait()

        # doublet expansion on the MXU: contract the donor axis of both
        # operands ([TC, D] · [D, PGp] with calls on lanes)
        p = jax.lax.dot_general(
            gt_buf[slot], mix_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TC, PGp]
        q = q_buf[slot][0, :]
        vals = jnp.log(p * (1.0 - q)[:, None] + jnp.maximum(q, 1e-4)[:, None])

        cbl = cbl_buf[slot][0, :]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
        onehot = (row_ids == cbl[None, :]).astype(jnp.float32)  # [TB, TC]
        contribution = jnp.dot(
            onehot, vals, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
        out_ref[pl.ds(off, tb), :] += contribution
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def tiled_logits_impl(
    genotype_prob,  # f32 [V, D]
    mixing_p,  # f32 [D, PGp] (lane-padded)
    penalties_p,  # f32 [1, PGp]
    vid,  # i32 [n_chunks * TC]
    cb_local,  # i32 [1, n_chunks * TC]
    q,  # f32 [1, n_chunks * TC]
    chunk_bounds,  # i32 [n_super + 1]
    chunk_suboff,  # i32 [n_chunks]
    *,
    n_super: int,
    tbs: int,  # barcodes per super-tile (TB * subtiles_per_super)
    tb: int,
    tc: int,
    interpret: bool = False,
):
    """Trace-time kernel invocation (jit-free; usable inside shard_map)."""
    d = genotype_prob.shape[1]
    pgp = mixing_p.shape[1]
    # XLA gather feeds the kernel with the big call axis on lanes
    # (column-gather form: equivalent to `gp[vid].T`, fuses better)
    gathered_t = genotype_prob.T[:, vid]  # [D, n_chunks*TC]
    # Mosaic DMA slices need 8-aligned sublane extents: pad the donor axis
    # with zero rows (zero prob x zero mixing row contributes nothing)
    d_pad = _round_up(d, 8)
    if d_pad != d:
        gathered_t = jnp.pad(gathered_t, ((0, d_pad - d), (0, 0)))
        mixing_p = jnp.pad(mixing_p, ((0, d_pad - d), (0, 0)))
    d = d_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((d, pgp), lambda s, *_: (0, 0)),
            pl.BlockSpec((1, pgp), lambda s, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tbs, pgp), lambda s, *_: (s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, d, tc), jnp.float32),
            pltpu.VMEM((2, 1, tc), jnp.int32),
            pltpu.VMEM((2, 1, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_likelihood_kernel, tb=tb, tc=tc)
    n_chunks = chunk_suboff.shape[0]
    flops_per_chunk = 2 * tc * d * pgp + 2 * tb * tc * pgp
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * flops_per_chunk,
            bytes_accessed=gathered_t.size * 4 + n_super * tbs * pgp * 4,
            transcendentals=n_chunks * tc * pgp,
        ),
        interpret=interpret,
    )(chunk_bounds, chunk_suboff, gathered_t, cb_local, q, mixing_p, penalties_p)
    return out


_tiled_logits = functools.partial(
    jax.jit, static_argnames=("n_super", "tbs", "tb", "tc", "interpret")
)(tiled_logits_impl)


class TiledDeviceCalls:
    """Device-resident tiled layout: upload once, reuse across EM iterations.

    ``subtiles_per_super`` controls the launch grid: one grid step covers
    TB·SPS barcodes, chosen so the grid stays at a few hundred steps.
    """

    def __init__(
        self,
        mixing: np.ndarray,
        penalties: np.ndarray,
        tiled: TiledCalls,
        subtiles_per_super: int | None = None,
    ):
        pg = mixing.shape[1]
        pgp = padded_pg(pg)
        mixing_p = np.zeros((mixing.shape[0], pgp), dtype=np.float32)
        mixing_p[:, :pg] = mixing
        penalties_p = np.zeros((1, pgp), dtype=np.float32)
        penalties_p[0, :pg] = penalties

        if subtiles_per_super is None:
            from .tiling import choose_subtiles_per_super

            subtiles_per_super = choose_subtiles_per_super(
                tiled.n_tiles, tiled.n_chunks, tiled.tile_barcodes, pgp
            )
        self.subtiles_per_super = subtiles_per_super
        n_super = -(-tiled.n_tiles // subtiles_per_super)

        # chunk ranges per super-tile + each chunk's sub-tile offset inside it
        chunks_per_tile = np.bincount(tiled.chunk2tile, minlength=tiled.n_tiles)
        tile_starts = np.concatenate([[0], np.cumsum(chunks_per_tile)])
        bounds = tile_starts[:: subtiles_per_super].tolist()
        if bounds[-1] != tiled.n_chunks:
            bounds.append(tiled.n_chunks)
        chunk_suboff = (tiled.chunk2tile % subtiles_per_super).astype(np.int32)

        self.n_pseudogenotypes = pg
        self.mixing_p = jnp.asarray(mixing_p)
        self.penalties_p = jnp.asarray(penalties_p)
        self.vid = jnp.asarray(tiled.vid)
        self.cb_local = jnp.asarray(tiled.cb_local)
        self.q = jnp.asarray(tiled.q)
        self.chunk_bounds = jnp.asarray(np.asarray(bounds, dtype=np.int32))
        self.chunk_suboff = jnp.asarray(chunk_suboff)
        self.n_barcodes = tiled.n_barcodes
        self.n_super = n_super
        self.tbs = tiled.tile_barcodes * subtiles_per_super
        self.tile_barcodes = tiled.tile_barcodes
        self.chunk_calls = tiled.chunk_calls
        self.n_chunks = tiled.n_chunks

    def logits(self, genotype_prob, interpret: bool = False):
        """Fused-kernel logits [n_barcodes, n_pseudogenotypes]."""
        # Mosaic kernels only compile for TPU; elsewhere run the interpreter
        interpret = interpret or jax.default_backend() != "tpu"
        out = _tiled_logits(
            genotype_prob,
            self.mixing_p,
            self.penalties_p,
            self.vid,
            self.cb_local,
            self.q,
            self.chunk_bounds,
            self.chunk_suboff,
            n_super=self.n_super,
            tbs=self.tbs,
            tb=self.tile_barcodes,
            tc=self.chunk_calls,
            interpret=interpret,
        )
        return out[: self.n_barcodes, : self.n_pseudogenotypes]


def barcode_logits_tiled(
    genotype_prob,
    mixing: np.ndarray,
    penalties: np.ndarray,
    tiled: TiledCalls,
    interpret: bool = False,
):
    """One-shot convenience wrapper around :class:`TiledDeviceCalls`."""
    return TiledDeviceCalls(mixing, penalties, tiled).logits(genotype_prob, interpret=interpret)


def barcode_logits_pallas(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes):
    """Drop-in XLA-path fallback signature (flat sorted arrays).

    Prefer ``TiledDeviceCalls`` with a host-precomputed layout — this wrapper
    exists so code paths that only have flat arrays keep working.
    """
    from . import likelihood as L

    return L.barcode_logits(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes)
