"""Fused Pallas TPU kernel for the likelihood accumulation.

Replaces the XLA chain gather → matmul → log → segment-sum, which round-trips
an [n_calls, n_pseudogenotypes] tensor through HBM. The kernel streams call
chunks through VMEM with double-buffered DMA and keeps each barcode tile's
logits resident.

Two measured design points (benchmarks/exp_estep.py, exp_split.py, v5e):

* **Fold before expansion.** Every mixing column sums to 1, so
  ``U = G[vid]·(1−q) + max(q, 1e-4)`` computed per (call, donor) satisfies
  ``U @ mix == (G@mix)·(1−q) + max(q, 1e-4)`` exactly — the fold happens in
  XLA fused into the gather, the kernel DMAs U and never touches q.
  Padding calls have q=1 → U=1 → log 0, still an exact no-op.
* **Split-word matmuls.** Mosaic offers only DEFAULT (1 bf16 pass) and
  HIGHEST (~6 passes + VPU corrections that contend with the log). HIGHEST
  costs ~20 ms/E-step at the benchmark shape; single-pass bf16 visibly
  shifts posteriors (~2e-2). The sweet spot: the exact-in-bf16 operand
  (mixing 0/0.5/1, one-hot 0/1) stays whole and the other operand splits
  into two bf16 words (hi = bf16(x), lo = bf16(x−hi)) — two DEFAULT passes
  recover ~16 mantissa bits with f32 MXU accumulation. Measured posterior
  error vs HIGHEST: 3e-5 max.

    per grid step (one *super-tile* of TB·SPS barcodes):
      out = penalties
      for each call chunk of the super-tile (inner fori_loop, DMA'd):
        args = mix_slᵀ-free dot: [PG_sl, TC] = mix_sl[PG_sl, D]·U[D, TC]
        vals = log(args)                       # VPU, no lane padding
        gs   = Σ_j vals[:, j·GPC : (j+1)·GPC]  # per-group sums, G−1 adds
        out[subtile·TB : +TB, :PG_sl] += onehot(seg_group)·gsᵀ  # MXU, K=GPC

Calls are pre-sorted by barcode, padded per barcode to whole groups of
G = TC/128 and per TB-barcode sub-tile to whole chunks (ops/tiling.py);
the group structure shrinks the scatter matmul's contraction from TC to
GPC = 128 columns (measured ~7% E-step at the bench shape, more at large
TC). Sub-tiles are grouped into super-tiles so the launch grid stays
small (important: this environment's remote Mosaic compile cost grows
with grid size). Chunk bounds and chunk→sub-tile offsets arrive via scalar
prefetch.

Reference hot loop being replaced: demuxalot/demux.py:256-263.
"""
from __future__ import annotations

import functools
import os

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

# in-kernel matmul strategy: "f32x2" (two-word bf16 split, ~16 mantissa
# bits, fastest accurate option), "highest" (full f32 emulation), or
# "default" (single bf16 pass — NOT posterior-safe, for experiments only)
_SPLIT_WORDS = {"default": 1, "f32x2": 2, "highest": 0}
KERNEL_PRECISION = os.environ.get("DEMUX_KERNEL_PRECISION", "f32x2").lower()
if KERNEL_PRECISION not in _SPLIT_WORDS:
    raise ValueError(
        f"DEMUX_KERNEL_PRECISION={KERNEL_PRECISION!r} is not one of "
        f"{sorted(_SPLIT_WORDS)}"
    )

# how many group columns multiply together before each in-kernel log
# (Σ log = log Π): 8 cuts the VPU transcendentals 8x while any sub-product
# of args >= 1e-4 stays a normal f32 (1e-32 > f32 min normal); 1 restores
# log-then-add for A/Bs. Read at trace time, like DEMUX_STACK_SCATTER.
_LOG_FOLD_WIDTH = int(os.environ.get("DEMUX_LOG_FOLD_WIDTH", "8"))
if not 1 <= _LOG_FOLD_WIDTH <= 8:
    raise ValueError("DEMUX_LOG_FOLD_WIDTH must be within 1..8")

# columns per staged call-stream DMA block (SB = STAGE_COLS/TC chunks per
# transfer, statically unrolled in-kernel). Measured NEGATIVE at the bench
# shape and left off by default (sb = 1 reproduces the classic one-chunk
# double buffer exactly): DMA microbenches say [32, 512] chunk slices
# stream at 120 GB/s vs 234 GB/s for [32, 8192] blocks
# (benchmarks/exp_dma_pattern.py — issue-rate, not stride, bound), but in
# the real kernels the chunk DMAs already hide behind ~equal per-chunk
# compute, so staging only adds unroll/predication overhead: M-step kernel
# +4.27 ms (sb=1) vs +5.05 ms (sb=16) over its gather, 2x2 A/B. Kept as a
# knob because the balance flips if per-chunk compute ever shrinks below
# the DMA issue cost. Read at trace time.
STAGE_COLS = int(os.environ.get("DEMUX_STAGE_COLS", "128"))
if STAGE_COLS < 128:
    raise ValueError("DEMUX_STAGE_COLS must be >= 128")


def stage_chunks(tc: int) -> int:
    """Chunks per staged DMA block for chunk width ``tc``."""
    return max(1, STAGE_COLS // tc)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_pg(pg: int) -> int:
    """Lane-pad the pseudo-genotype axis to whole 128-lane tiles."""
    return _round_up(pg, LANE)


def sublane_pg(pg: int) -> int:
    """Sublane-pad the pseudo-genotype axis (8-row granularity)."""
    return _round_up(pg, 8)


def bf16_words(x, n_words: int):
    """Split ``x`` into ``n_words`` bf16 words: hi = bf16(x), lo = bf16(x−hi), …

    This is THE posterior-safe precision strategy for in-kernel matmuls
    (CLAUDE.md invariant: no single-pass bf16): summing the words restores
    ~16 mantissa bits, so DEFAULT-precision MXU passes over the words against
    a bf16-exact operand are exact up to the f32 accumulator. Every word
    split in this package must come through here so a precision change lands
    everywhere at once.
    """
    words, remainder = [], x
    for _ in range(n_words):
        word = remainder.astype(jnp.bfloat16).astype(jnp.float32)
        remainder = remainder - word
        words.append(word)
    return words


def dot_words(a, b, dims, n_words: int, split: str = "b"):
    """dot_general where one operand is bf16-exact and the other is split.

    The non-``split`` operand's entries must be exactly representable in
    bf16 (0, 0.5, 1 …) so splitting the other via :func:`bf16_words` makes
    each DEFAULT-precision MXU pass exact up to the f32 accumulator.
    ``dims`` = (a_contract, b_contract); output dims follow dot_general
    (a-free then b-free). n_words=0 falls back to one HIGHEST dot.
    """
    if n_words == 0:
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    total = None
    for word in bf16_words(a if split == "a" else b, n_words):
        lhs, rhs = (word, b) if split == "a" else (a, word)
        part = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        total = part if total is None else total + part
    return total


def dot_words_stacked(a, b_split, n_words: int):
    """One-pass variant of :func:`dot_words` for skinny contractions.

    Splits ``b_split`` (contracted on its axis 0) into bf16 words and stacks
    them along the contraction axis instead of summing separate passes —
    ``a`` must already be tiled ``n_words`` times along its contraction axis
    (axis 1). With K ≤ 64 donors the MXU pads the contraction to its full
    128 depth anyway, so one stacked pass costs what one word-pass does —
    halving the expansion matmul at f32x2 precision. Numerically identical
    to the summed passes up to f32 accumulation order.
    """
    stacked = jnp.concatenate(bf16_words(b_split, n_words), axis=0)
    return jax.lax.dot_general(
        a, stacked, dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _likelihood_kernel(
    bounds_ref,  # SMEM scalar prefetch [n_bands * (n_super + 1)]: chunk ranges
    suboff_ref,  # SMEM scalar prefetch [n_chunks]: sub-tile index within super-tile
    u_hbm,  # ANY [D, n_chunks*TC] pre-folded log arguments (call-major lanes)
    sg_hbm,  # ANY [1, n_chunks*GPC] barcode index within sub-tile per group
    mix_ref,  # VMEM [PG_sl, D] mixing with pseudogenotypes on sublanes
    pen_ref,  # VMEM [1, PGp]
    out_ref,  # VMEM [TBS, PGp] — this super-tile's logits (resident across bands)
    *rest,  # optional probs_ref (softmax output), then scratch + sems
    tb: int,
    tc: int,
    pg_sl: int,
    n_words: int,
    n_super: int,
    stack_k: bool,
    pg: int = 0,  # true pseudo-genotype count, for the softmax lane mask
    softmax_out: bool = False,
    stack_scatter: bool = False,
):
    if softmax_out:
        probs_ref, u_buf, sg_buf, u_sem, sg_sem = rest
    else:
        probs_ref = None
        u_buf, sg_buf, u_sem, sg_sem = rest
    group = max(1, tc // 128)
    gpc = tc // group
    sb = stage_chunks(tc)  # chunks per staged DMA block
    s = pl.program_id(0)
    band = pl.program_id(1)  # iterates fastest: out block stays resident
    at = band * (n_super + 1) + s
    lo = bounds_ref[at]
    hi = bounds_ref[at + 1]
    n = hi - lo

    # staged DMA: fetch SB chunks per transfer (DMA issue rate, not stride,
    # bounds the stream — see STAGE_COLS). Blocks may overrun this region's
    # hi into the next region's columns (valid rows, unread) and the global
    # tail rides the layout's stage-slack padding chunks.
    def dmas(slot, blk):
        base = lo + blk * sb
        return (
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(base * tc, sb * tc)], u_buf.at[slot], u_sem.at[slot]
            ),
            pltpu.make_async_copy(
                sg_hbm.at[:, pl.ds(base * gpc, sb * gpc)], sg_buf.at[slot], sg_sem.at[slot]
            ),
        )

    @pl.when(band == 0)
    def _init():
        out_ref[:] = jnp.broadcast_to(pen_ref[0, :], out_ref.shape)

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
                u_chunk = u_buf[slot, :, k * tc : (k + 1) * tc]  # [D, TC]

                # doublet expansion on the MXU with the log laid out
                # pseudogenotypes-on-sublanes — no 128-lane padding on the
                # log. Real rows satisfy args >= 1e-4 (U >= q~, mixing
                # columns sum to 1); the floor only catches the all-zero
                # sublane-padding rows, whose log(0) = -inf would otherwise
                # turn into NaN in the split words.
                if stack_k:
                    args = dot_words_stacked(mix_ref[:], u_chunk, n_words)  # [PG_sl, TC]
                else:
                    args = dot_words(mix_ref[:], u_chunk, ((1,), (0,)), n_words)

                # per-group folds: group a's G calls sit at lane a of G
                # GPC-lane blocks (ops/tiling.py layout). Σ log(arg) =
                # log(Π arg), so fold the group's columns by MULTIPLYING
                # before the log — up to 8 at a time, cutting the VPU
                # transcendentals by the sub-product size. Exactness:
                # padding args are exactly 1 (×1 is the identity), real
                # args >= 1e-4 so an 8-column sub-product >= 1e-32 stays a
                # normal f32; the 1e-30 floor still only catches all-zero
                # padding rows.
                gs = None
                for j0 in range(0, group, _LOG_FOLD_WIDTH):
                    ps = args[:, j0 * gpc : (j0 + 1) * gpc]
                    for j in range(j0 + 1, min(j0 + _LOG_FOLD_WIDTH, group)):
                        ps = ps * args[:, j * gpc : (j + 1) * gpc]
                    part = jnp.log(jnp.maximum(ps, 1e-30))  # [PG_sl, GPC]
                    gs = part if gs is None else gs + part

                sg = sg_buf[slot, 0, k * gpc : (k + 1) * gpc]
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, gpc), 0)
                onehot = (row_ids == sg[None, :]).astype(jnp.float32)  # [TB, GPC]
                if stack_scatter and n_words >= 2:
                    # one K = n_words·GPC dot instead of n_words summed
                    # K=GPC dots: the same MXU passes issued as a single
                    # instruction (the word split mirrors dot_words_stacked;
                    # exact up to f32 accumulation order). The one-hot tiles
                    # along its contraction axis.
                    gs_stacked = jnp.concatenate(
                        bf16_words(gs, n_words), axis=1
                    )  # [PG_sl, n_words*GPC]
                    onehot_tiled = jnp.concatenate([onehot] * n_words, axis=1)
                    contribution = jax.lax.dot_general(
                        onehot_tiled, gs_stacked,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )  # [TB, PG_sl]
                else:
                    contribution = dot_words(onehot, gs, ((1,), (1,)), n_words)  # [TB, PG_sl]

                off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
                out_ref[pl.ds(off, tb), :pg_sl] += contribution

        return 0

    jax.lax.fori_loop(0, jax.lax.div(n + sb - 1, sb), body, 0)

    if softmax_out:
        # after the super-tile's LAST band the logits block is final:
        # emit row-softmax probabilities alongside, masking the lane
        # padding (pg..PGp-1 lanes hold untouched penalty zeros, and
        # sublane-padding rows beyond pg_sl were never written)
        @pl.when(band == pl.num_programs(1) - 1)
        def _softmax():
            logits = out_ref[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            masked = jnp.where(lane < pg, logits, -jnp.inf)
            m = jnp.max(masked, axis=1, keepdims=True)
            e = jnp.exp(masked - m)
            probs_ref[:] = e / jnp.sum(e, axis=1, keepdims=True)


def tiled_logits_impl(
    genotype_prob,  # f32 [V, D] (or [D, V] with donor_major=True)
    mixing_sl,  # f32 [PG_sl, Dp] (pseudogenotypes on sublanes, donors 8-padded)
    penalties_p,  # f32 [1, PGp]
    vid,  # i32 [n_chunks * TC], band-LOCAL variant ids
    seg_group,  # i32 [1, n_chunks * GPC] tile-local barcode per group
    q,  # f32 [1, n_chunks * TC]
    chunk_bounds,  # i32 [n_bands * (n_super + 1)]
    chunk_suboff,  # i32 [n_chunks]
    *,
    n_super: int,
    tbs: int,  # barcodes per super-tile (TB * subtiles_per_super)
    tb: int,
    tc: int,
    band_specs: tuple = (),  # ((v_lo, v_hi, chunk_lo, chunk_hi), ...) static
    interpret: bool = False,
    n_words: int | None = None,
    stack_k: bool | None = None,
    donor_major: bool = False,
    softmax_out: bool = False,
    n_pseudogenotypes: int = 0,  # true pg count; required with softmax_out
):
    """Trace-time kernel invocation (jit-free; usable inside shard_map).

    ``band_specs`` describes the variant bands of the layout (one full-range
    band when empty): each band's calls are gathered against only its table
    slice — keeping every gather table under the fast-path size
    (docs/DESIGN.md §7) — and the kernel walks a (super_tile, band) grid
    accumulating into the resident logits block.

    ``donor_major=True`` takes ``genotype_prob`` as [D, V] — the layout the
    gather wants natively and the M-step kernel produces — skipping the
    per-iteration [V, D]→[D, V] relayout of the whole table inside EM loops.

    ``softmax_out=True`` returns ``(logits, probs)``: each super-tile's
    row-softmax is computed in-kernel once its logits block is final,
    saving EM loops the separate full-width XLA softmax pass (the lane
    padding is masked with ``n_pseudogenotypes``).
    """
    if n_words is None:
        n_words = _SPLIT_WORDS[KERNEL_PRECISION]
    pg_sl, d_pad = mixing_sl.shape
    if stack_k is None:
        # stacking pays off while the stacked contraction still fits one
        # 128-deep MXU pass (d_pad * n_words <= 128, i.e. <= 64 donors at f32x2)
        stack_k = n_words >= 2 and d_pad * n_words <= 128
    stack_k = stack_k and n_words >= 2
    mix_block = mixing_sl if not stack_k else jnp.tile(mixing_sl, (1, n_words))
    pgp = penalties_p.shape[1]
    d = genotype_prob.shape[0] if donor_major else genotype_prob.shape[1]
    n_variants = genotype_prob.shape[1] if donor_major else genotype_prob.shape[0]
    n_chunks = chunk_suboff.shape[0]
    gpc = tc // max(1, tc // 128)  # groups per chunk (ops/tiling.py)
    if not band_specs:
        band_specs = ((0, n_variants, 0, n_chunks),)
    n_bands = len(band_specs)

    # stage slack: the staged DMA fetches SB chunks per transfer, so the
    # last block of the last region may read up to SB-1 chunks past the
    # final real chunk. Pad the INDEX stream before the gather — the gather
    # then emits the slack columns in its own pass (padding u itself would
    # copy the whole stream): padded q = 1 makes slack columns u = 1 (an
    # exact log no-op), and slack seg_group is never scattered because
    # those chunks are beyond every region's hi.
    sb = stage_chunks(tc)
    slack = (sb - 1) * tc
    if slack:
        vid = jnp.pad(jnp.asarray(vid), (0, slack))
        q = jnp.pad(jnp.asarray(q), ((0, 0), (0, slack)), constant_values=1.0)
        seg_group = jnp.pad(
            jnp.asarray(seg_group), ((0, 0), (0, (sb - 1) * gpc))
        )

    # XLA side: per-band column gathers fused with the fold; donor axis
    # padded to the 8-sublane granularity Mosaic DMAs need (zero mixing
    # columns null the extra rows)
    u_parts = []
    for i, (v_lo, v_hi, c_lo, c_hi) in enumerate(band_specs):
        if donor_major:
            table_t = jax.lax.slice_in_dim(genotype_prob, v_lo, v_hi, axis=1)
        else:
            table_t = jax.lax.slice_in_dim(genotype_prob, v_lo, v_hi, axis=0).T
        hi_cols = c_hi * tc + (slack if i == n_bands - 1 else 0)
        vid_k = jax.lax.slice_in_dim(vid, c_lo * tc, hi_cols, axis=0)
        q_k = jax.lax.slice_in_dim(q, c_lo * tc, hi_cols, axis=1)
        gathered = table_t[:, vid_k]  # [D, band_calls]
        u_parts.append(gathered * (1.0 - q_k) + jnp.maximum(q_k, 1e-4))
    u = u_parts[0] if n_bands == 1 else jnp.concatenate(u_parts, axis=1)
    if d_pad != d:
        u = jnp.pad(u, ((0, d_pad - d), (0, 0)))

    from .tiling import check_kernel_budgets

    check_kernel_budgets(
        "likelihood",
        # out blocks are PIPELINE-DOUBLE-BUFFERED by Mosaic (measured: a
        # softmax_out layout sized 1x per block OOMed scoped VMEM at
        # exactly 4x tbs*pgp*4), so each output block counts twice;
        # softmax_out keeps a SECOND resident (tbs, pgp) block (probs)
        (2 if softmax_out else 1) * 2 * tbs * pgp * 4
        + mix_block.size * 4 + pgp * 4
        # double-buffered SB-chunk staging blocks
        + 2 * d_pad * sb * tc * 4 + 2 * sb * gpc * 4,
        n_super * n_bands,
    )

    if softmax_out and n_pseudogenotypes <= 0:
        raise ValueError("softmax_out requires n_pseudogenotypes")
    out_block = pl.BlockSpec((tbs, pgp), lambda s, k, *_: (s, 0))
    out_shape = jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(mix_block.shape, lambda s, k, *_: (0, 0)),
            pl.BlockSpec((1, pgp), lambda s, k, *_: (0, 0)),
        ],
        out_specs=[out_block, out_block] if softmax_out else out_block,
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, sb * tc), jnp.float32),
            pltpu.VMEM((2, 1, sb * gpc), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _likelihood_kernel, tb=tb, tc=tc, pg_sl=pg_sl, n_words=n_words,
        n_super=n_super, stack_k=stack_k,
        pg=n_pseudogenotypes, softmax_out=softmax_out,
        # default ON since the round-3 TPU A/B (bench-shape E-step 17.4 ms
        # stacked vs 18.0 ms summed; bit-compatible up to f32 accumulation
        # order). PROCESS-level — read at trace time, so flipping it after
        # the first compile of a shape has no effect in that process.
        stack_scatter=os.environ.get("DEMUX_STACK_SCATTER", "1") != "0",
    )
    passes = max(n_words, 1)
    exp_passes = 1 if stack_k else passes
    flops_per_chunk = 2 * tc * d_pad * pg_sl * exp_passes + 2 * tb * gpc * pg_sl * passes
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape] if softmax_out else out_shape,
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * flops_per_chunk,
            bytes_accessed=u.size * 4 + (2 if softmax_out else 1) * n_super * tbs * pgp * 4,
            transcendentals=n_chunks * tc * pg_sl,
        ),
        interpret=interpret,
    )(chunk_bounds, chunk_suboff, u, seg_group, mix_block, penalties_p)
    return tuple(out) if softmax_out else out


_tiled_logits = functools.partial(
    jax.jit,
    static_argnames=("n_super", "tbs", "tb", "tc", "band_specs", "interpret",
                     "n_words", "stack_k", "donor_major", "softmax_out",
                     "n_pseudogenotypes"),
)(tiled_logits_impl)


def build_mixing_sl(mixing: np.ndarray) -> np.ndarray:
    """Mixing transposed to [PG_sl, Dp]: pseudogenotypes on sublanes."""
    d, pg = mixing.shape
    out = np.zeros((sublane_pg(pg), _round_up(d, 8)), dtype=np.float32)
    out[:pg, :d] = mixing.T
    return out


class TiledCallStreams:
    """Device-uploaded call stream of a tiled layout.

    The big per-call arrays (vid / seg_group / q — hundreds of MB at
    product scale) depend only on the tiling, never on the mixing shape, so
    one upload serves every :class:`TiledDeviceCalls` view built over the
    same tiling (e.g. learn at doublet_prior=0 and predict at 0.35 share
    one stream; only the tiny bounds/suboff/mixing arrays differ per view).
    """

    __slots__ = ("vid", "seg_group", "q")

    def __init__(self, tiled):
        self.vid = jnp.asarray(tiled.vid)
        self.seg_group = jnp.asarray(tiled.seg_group)
        self.q = jnp.asarray(tiled.q)


class TiledDeviceCalls:
    """Device-resident tiled layout: upload once, reuse across EM iterations.

    ``subtiles_per_super`` controls the launch grid: one grid step covers
    TB·SPS barcodes, chosen so the grid stays at a few hundred steps.
    ``streams`` shares an existing :class:`TiledCallStreams` upload of the
    same tiling; everything recomputed here (bounds, suboffsets, mixing)
    is small.
    """

    def __init__(
        self,
        mixing: np.ndarray,
        penalties: np.ndarray,
        tiled,  # TiledCalls or BandedTiledCalls
        subtiles_per_super: int | None = None,
        out_blocks: int = 1,  # 2 when logits() will request softmax_out
        streams: TiledCallStreams | None = None,
    ):
        from .tiling import BandedTiledCalls

        pg = mixing.shape[1]
        pgp = padded_pg(pg)
        penalties_p = np.zeros((1, pgp), dtype=np.float32)
        penalties_p[0, :pg] = penalties

        if isinstance(tiled, BandedTiledCalls):
            band_chunk_offsets = tiled.band_chunk_offsets
            band_edges = tiled.band_edges
        else:
            band_chunk_offsets = np.asarray([0, tiled.n_chunks], dtype=np.int64)
            band_edges = None  # full range; resolved at call time
        n_bands = len(band_chunk_offsets) - 1

        if subtiles_per_super is None:
            from .tiling import choose_subtiles_per_super

            # budget per grid step applies within the largest band region
            max_band_chunks = int(np.diff(band_chunk_offsets).max())
            from .tiling import SUPER_ROWS_BUDGET

            # softmax_out doubles the resident output footprint; halve the
            # row budget so the doubled (and pipeline-double-buffered)
            # blocks still fit the 16 MB scoped-VMEM limit
            subtiles_per_super = choose_subtiles_per_super(
                tiled.n_tiles, max_band_chunks, tiled.tile_barcodes, pgp,
                max_super_rows_bytes=SUPER_ROWS_BUDGET // max(out_blocks, 1),
                n_bands=n_bands,
            )
        self.subtiles_per_super = subtiles_per_super
        n_super = -(-tiled.n_tiles // subtiles_per_super)

        # per band: chunk ranges per super-tile (chunks are band-major and
        # tile-ordered within a band); plus each chunk's sub-tile offset
        bounds = []
        for k in range(n_bands):
            c_lo, c_hi = int(band_chunk_offsets[k]), int(band_chunk_offsets[k + 1])
            chunks_per_tile = np.bincount(
                tiled.chunk2tile[c_lo:c_hi], minlength=tiled.n_tiles
            )
            tile_starts = c_lo + np.concatenate([[0], np.cumsum(chunks_per_tile)])
            band_bounds = tile_starts[:: subtiles_per_super].tolist()
            if len(band_bounds) < n_super + 1 or band_bounds[-1] != c_hi:
                band_bounds = (band_bounds + [c_hi] * (n_super + 1))[: n_super + 1]
            assert len(band_bounds) == n_super + 1 and band_bounds[-1] == c_hi
            bounds.extend(band_bounds)
        chunk_suboff = (tiled.chunk2tile % subtiles_per_super).astype(np.int32)

        if band_edges is None:
            self.band_specs = ()
        else:
            self.band_specs = tuple(
                (int(band_edges[k]), int(band_edges[k + 1]),
                 int(band_chunk_offsets[k]), int(band_chunk_offsets[k + 1]))
                for k in range(n_bands)
            )
        self.n_pseudogenotypes = pg
        self.mixing_sl = jnp.asarray(build_mixing_sl(mixing))
        self.penalties_p = jnp.asarray(penalties_p)
        if streams is None:
            streams = TiledCallStreams(tiled)
        self.vid = streams.vid
        self.seg_group = streams.seg_group
        self.q = streams.q
        self.chunk_bounds = jnp.asarray(np.asarray(bounds, dtype=np.int32))
        self.chunk_suboff = jnp.asarray(chunk_suboff)
        self.n_barcodes = tiled.n_barcodes
        self.n_super = n_super
        self.tbs = tiled.tile_barcodes * subtiles_per_super
        self.tile_barcodes = tiled.tile_barcodes
        self.chunk_calls = tiled.chunk_calls
        self.n_chunks = tiled.n_chunks

    def logits(self, genotype_prob, interpret: bool = False, donor_major: bool = False):
        """Fused-kernel logits [n_barcodes, n_pseudogenotypes]."""
        # Mosaic kernels only compile for TPU; elsewhere run the interpreter
        interpret = interpret or jax.default_backend() != "tpu"
        out = _tiled_logits(
            genotype_prob,
            self.mixing_sl,
            self.penalties_p,
            self.vid,
            self.seg_group,
            self.q,
            self.chunk_bounds,
            self.chunk_suboff,
            n_super=self.n_super,
            tbs=self.tbs,
            tb=self.tile_barcodes,
            tc=self.chunk_calls,
            band_specs=self.band_specs,
            interpret=interpret,
            donor_major=donor_major,
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
