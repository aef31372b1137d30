"""Fused Pallas TPU kernel for the likelihood accumulation.

Replaces the XLA chain gather → matmul → log → segment-sum, which round-trips
an [n_calls, n_pseudogenotypes] tensor through HBM (the dominant cost at
scale: ~2·N·PG·4 bytes per E-step). The kernel streams call chunks through
VMEM and keeps each barcode tile's logits block resident until finished:

    per chunk c (grid step):
      P    = G[c] @ mixing            # [TC, PG]  doublet expansion, MXU
      vals = log(P·(1−q) + max(q,1e-4))           # VPU
      out[tile(c)] += onehot(cb_local)ᵀ @ vals    # [TB, PG] scatter-matmul, MXU

Calls are pre-sorted by barcode and padded per tile (ops/tiling.py), so a
tile's chunks are consecutive grid steps and the output block stays in VMEM
(standard Pallas revisiting reduction). Chunk→tile ownership is a
scalar-prefetch array feeding the output index_map. Padding calls carry
q = 1 → log(1) = 0, exactly zero contribution.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _likelihood_kernel(
    chunk2tile_ref,  # SMEM scalar prefetch [n_chunks]
    gt_ref,  # VMEM [D, TC] gathered genotype probs for this chunk (call-major lanes)
    cbl_ref,  # VMEM [1, TC] local barcode index in tile
    q_ref,  # VMEM [1, TC]
    mix_ref,  # VMEM [D, PGp]
    pen_ref,  # VMEM [1, PGp]
    out_ref,  # VMEM [TB, PGp] — revisited across a tile's chunks
    *,
    tb: int,
    tc: int,
):
    c = pl.program_id(0)
    tile = chunk2tile_ref[c]
    prev_tile = chunk2tile_ref[jnp.maximum(c - 1, 0)]
    is_first_chunk_of_tile = jnp.logical_or(c == 0, tile != prev_tile)

    @pl.when(is_first_chunk_of_tile)
    def _init():
        out_ref[:] = jnp.broadcast_to(pen_ref[0, :], (tb, out_ref.shape[1]))

    # doublet expansion on the MXU: [TC, D] · [D, PGp] with the call axis on
    # lanes in both operands (contract dim 0 of each)
    p = jax.lax.dot_general(
        gt_ref[:], mix_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TC, PGp]
    q = q_ref[0, :]
    vals = jnp.log(p * (1.0 - q)[:, None] + jnp.maximum(q, 1e-4)[:, None])

    cbl = cbl_ref[0, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
    onehot = (row_ids == cbl[None, :]).astype(jnp.float32)  # [TB, TC]
    out_ref[:] += jnp.dot(onehot, vals, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_barcodes", "n_tiles", "tb", "tc", "n_chunks", "interpret"),
)
def _tiled_logits(
    genotype_prob,  # f32 [V, D]
    mixing_p,  # f32 [D, PGp] (lane-padded)
    penalties_p,  # f32 [1, PGp]
    vid,  # i32 [n_chunks * TC]
    cb_local,  # i32 [n_chunks, TC]
    q,  # f32 [n_chunks, TC]
    chunk2tile,  # i32 [n_chunks]
    *,
    n_barcodes: int,
    n_tiles: int,
    tb: int,
    tc: int,
    n_chunks: int,
    interpret: bool = False,
):
    d = genotype_prob.shape[1]
    pgp = mixing_p.shape[1]
    # XLA gather feeds the kernel; transposed so the big call axis is on lanes
    gathered_t = genotype_prob[vid].T  # [D, n_chunks*TC]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((d, tc), lambda c, s: (0, c)),
            pl.BlockSpec((1, tc), lambda c, s: (c, 0)),
            pl.BlockSpec((1, tc), lambda c, s: (c, 0)),
            pl.BlockSpec((d, pgp), lambda c, s: (0, 0)),
            pl.BlockSpec((1, pgp), lambda c, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, pgp), lambda c, s: (s[c], 0)),
    )

    kernel = functools.partial(_likelihood_kernel, tb=tb, tc=tc)
    flops_per_chunk = 2 * tc * d * pgp + 2 * tb * tc * pgp
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tb, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * flops_per_chunk,
            bytes_accessed=gathered_t.size * 4 + n_tiles * tb * pgp * 4,
            transcendentals=n_chunks * tc * pgp,
        ),
        interpret=interpret,
    )(chunk2tile, gathered_t, cb_local, q, mixing_p, penalties_p)
    return out


def barcode_logits_tiled(
    genotype_prob,
    mixing: np.ndarray,
    penalties: np.ndarray,
    tiled: TiledCalls,
    interpret: bool = False,
):
    """Run the fused kernel over a host-tiled call layout.

    Returns logits [n_barcodes, n_pseudogenotypes] (lane padding stripped).
    """
    # Mosaic kernels only compile for TPU; elsewhere run the interpreter
    interpret = interpret or jax.default_backend() != "tpu"
    pg = mixing.shape[1]
    pgp = _round_up(pg, LANE)
    mixing_p = np.zeros((mixing.shape[0], pgp), dtype=np.float32)
    mixing_p[:, :pg] = mixing
    penalties_p = np.zeros((1, pgp), dtype=np.float32)
    penalties_p[0, :pg] = penalties

    out = _tiled_logits(
        genotype_prob,
        jnp.asarray(mixing_p),
        jnp.asarray(penalties_p),
        jnp.asarray(tiled.vid),
        jnp.asarray(tiled.cb_local),
        jnp.asarray(tiled.q),
        jnp.asarray(tiled.chunk2tile),
        n_barcodes=tiled.n_barcodes,
        n_tiles=tiled.n_tiles,
        tb=tiled.tile_barcodes,
        tc=tiled.chunk_calls,
        n_chunks=tiled.n_chunks,
        interpret=interpret,
    )
    return out[: tiled.n_barcodes, :pg]


def barcode_logits_pallas(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes):
    """Drop-in XLA-path fallback signature (flat sorted arrays).

    Prefer ``barcode_logits_tiled`` with a host-precomputed TiledCalls — this
    wrapper exists so code paths that only have flat arrays keep working.
    """
    from . import likelihood as L

    return L.barcode_logits(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes)
