"""EXPERIMENTAL in-kernel-gather kernel variants (evicted from the package).

Both EM kernels pay an XLA gather before launch (genotype rows for the
E-step, posterior rows for the M-step) at the gather engine's measured
~2.1-2.6 ns/row floor — the dominant E-step/M-step cost at the bench
shape. These variants instead keep each band's table VMEM-resident and
gather per call with ``jnp.take`` inside the kernel, hoping to (a) run the
gather on-core and (b) overlap it with the MXU work.

They were measured NOT viable on this toolchain and moved here in round 4
(VERDICT r3 ask #6):

* Mosaic's dynamic-gather capability probe (``exp_gather_forms.py``) shows
  exactly one lowering — same-shape ``take_along_axis`` on the lane axis
  within one 128-lane register. Row-gather ``take`` forms (what these
  kernels need) do not lower; sublane-axis and >128-lane forms crash the
  remote compiler. The kernels therefore only run in interpret mode.
* Even granting a future lowering, the round-3 A/Bs at the bench shape
  (``exp_inkernel_gather_estep.py`` / ``_mstep.py``) measured the banded
  layouts they require as not-better than the mainline.

Kept runnable (interpret mode + the A/B harnesses) so a future toolchain
that lowers row-gathers can be re-evaluated in one command:

    python benchmarks/exp_gather_forms.py          # capability canary
    python benchmarks/exp_inkernel_gather_estep.py # A/B (if canary passes)
    python benchmarks/inkernel_gather_kernels.py   # interpret-mode self-test

Numerical equality vs the mainline kernels is asserted by ``self_test()``
below (run by this module's __main__), replacing the package tests that
covered these paths while they lived in ``demuxalot_tpu.ops``.
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demuxalot_tpu.ops.pallas_likelihood import (
    _LOG_FOLD_WIDTH,
    _SPLIT_WORDS,
    KERNEL_PRECISION,
    _round_up,
    dot_words,
)
from demuxalot_tpu.ops.tiling import check_kernel_budgets


def banded_table(genotype_prob, band_specs, v_band_pad: int, d_pad: int,
                 donor_major: bool = False):
    """Stack per-band genotype rows into [n_bands·v_band_pad, D_pad].

    Each band's rows are padded to a uniform sublane-aligned height so the
    in-kernel-gather kernels can fetch band k as one pipelined VMEM block.
    Padding rows are zeros; band-local ids never reach them.
    """
    parts = []
    for v_lo, v_hi, _c_lo, _c_hi in band_specs:
        if donor_major:
            block = jax.lax.slice_in_dim(genotype_prob, v_lo, v_hi, axis=1).T
        else:
            block = jax.lax.slice_in_dim(genotype_prob, v_lo, v_hi, axis=0)
        d = block.shape[1]
        parts.append(
            jnp.pad(block, ((0, v_band_pad - block.shape[0]), (0, d_pad - d)))
        )
    return jnp.concatenate(parts, axis=0)


def _likelihood_kernel_ig(
    bounds_ref,  # SMEM scalar prefetch [n_bands * (n_super + 1)]
    suboff_ref,  # SMEM scalar prefetch [n_chunks]
    vid_hbm,  # ANY [1, n_chunks*TC] BAND-LOCAL variant id per call slot
    sg_hbm,  # ANY [1, n_chunks*GPC]
    q_hbm,  # ANY [1, n_chunks*TC]
    table_ref,  # VMEM [v_band_pad, D_pad] — this band's genotype rows
    mix_ref,  # VMEM [PG_sl, D_pad]
    pen_ref,  # VMEM [1, PGp]
    out_ref,  # VMEM [TBS, PGp]
    vid_buf,  # VMEM scratch [2, 1, TC] i32
    sg_buf,  # VMEM scratch [2, 1, GPC] i32
    q_buf,  # VMEM scratch [2, 1, TC] f32
    vid_sem,
    sg_sem,
    q_sem,
    *,
    tb: int,
    tc: int,
    pg_sl: int,
    n_words: int,
    n_super: int,
):
    """In-kernel-gather E-step: resident band table + per-call jnp.take."""
    group = max(1, tc // 128)
    gpc = tc // group
    s = pl.program_id(0)
    band = pl.program_id(1)
    at = band * (n_super + 1) + s
    lo = bounds_ref[at]
    hi = bounds_ref[at + 1]
    n = hi - lo

    def dmas(slot, ci):
        return (
            pltpu.make_async_copy(
                vid_hbm.at[:, pl.ds((lo + ci) * tc, tc)], vid_buf.at[slot], vid_sem.at[slot]
            ),
            pltpu.make_async_copy(
                sg_hbm.at[:, pl.ds((lo + ci) * gpc, gpc)], sg_buf.at[slot], sg_sem.at[slot]
            ),
            pltpu.make_async_copy(
                q_hbm.at[:, pl.ds((lo + ci) * tc, tc)], q_buf.at[slot], q_sem.at[slot]
            ),
        )

    @pl.when(band == 0)
    def _init():
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

        # the gather: TC genotype rows from the resident band table
        rows = jnp.take(table_ref[:], vid_buf[slot][0, :], axis=0)  # [TC, D_pad]
        q = q_buf[slot][0, :]
        # fold: padding calls (q = 1) give u = 1 -> args = Σ mix = 1 -> log 0;
        # padded donor columns carry zero mixing, so their u values are inert
        u = rows * (1.0 - q)[:, None] + jnp.maximum(q, 1e-4)[:, None]
        args = dot_words(mix_ref[:], u, ((1,), (1,)), n_words, split="b")  # [PG_sl, TC]

        # same product-before-log fold as the mainline kernel
        gs = None
        for j0 in range(0, group, _LOG_FOLD_WIDTH):
            ps = args[:, j0 * gpc : (j0 + 1) * gpc]
            for j in range(j0 + 1, min(j0 + _LOG_FOLD_WIDTH, group)):
                ps = ps * args[:, j * gpc : (j + 1) * gpc]
            part = jnp.log(jnp.maximum(ps, 1e-30))
            gs = part if gs is None else gs + part

        sg = sg_buf[slot][0, :]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, gpc), 0)
        onehot = (row_ids == sg[None, :]).astype(jnp.float32)
        contribution = dot_words(onehot, gs, ((1,), (1,)), n_words)

        off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
        out_ref[pl.ds(off, tb), :pg_sl] += contribution
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def tiled_logits_inkernel_gather(
    genotype_prob, mixing_sl, penalties_p, vid, seg_group, q,
    chunk_bounds, chunk_suboff,
    *,
    n_super: int, tbs: int, tb: int, tc: int, band_specs: tuple,
    interpret: bool = False, n_words: int | None = None,
    donor_major: bool = False,
):
    """Launcher for the experimental in-kernel-gather E-step kernel.

    Same argument contract as ``tiled_logits_impl`` restricted to a banded
    layout (``band_specs`` non-empty; ``vid`` carries BAND-LOCAL ids).
    """
    if n_words is None:
        n_words = _SPLIT_WORDS[KERNEL_PRECISION]
    if not band_specs:
        n_variants = genotype_prob.shape[1] if donor_major else genotype_prob.shape[0]
        band_specs = ((0, n_variants, 0, chunk_suboff.shape[0]),)
    pg_sl, d_pad = mixing_sl.shape
    pgp = penalties_p.shape[1]
    gpc = tc // max(1, tc // 128)
    n_bands = len(band_specs)
    n_chunks = chunk_suboff.shape[0]
    v_band_pad = _round_up(max(v_hi - v_lo for v_lo, v_hi, *_ in band_specs), 8)

    table = banded_table(genotype_prob, band_specs, v_band_pad, d_pad, donor_major)
    vid2d = jnp.asarray(vid).reshape(1, -1)

    check_kernel_budgets(
        "likelihood-ig",
        tbs * pgp * 4
        + 2 * v_band_pad * d_pad * 4  # pipelined band table blocks
        + mixing_sl.size * 4 + pgp * 4
        + 2 * (tc * 4 + gpc * 4 + tc * 4),
        n_super * n_bands,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vid
            pl.BlockSpec(memory_space=pl.ANY),  # seg_group
            pl.BlockSpec(memory_space=pl.ANY),  # q
            pl.BlockSpec((v_band_pad, d_pad), lambda s, k, *_: (k, 0)),  # band table
            pl.BlockSpec(mixing_sl.shape, lambda s, k, *_: (0, 0)),
            pl.BlockSpec((1, pgp), lambda s, k, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tbs, pgp), lambda s, k, *_: (s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, tc), jnp.int32),
            pltpu.VMEM((2, 1, gpc), jnp.int32),
            pltpu.VMEM((2, 1, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _likelihood_kernel_ig, tb=tb, tc=tc, pg_sl=pg_sl, n_words=n_words,
        n_super=n_super,
    )
    passes = max(n_words, 1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * (2 * tc * d_pad * pg_sl + 2 * tb * gpc * pg_sl) * passes,
            bytes_accessed=n_chunks * tc * 12
            + n_super * n_bands * v_band_pad * d_pad * 4
            + n_super * tbs * pgp * 4,
            transcendentals=n_chunks * tc * pg_sl,
        ),
        interpret=interpret,
    )(chunk_bounds, chunk_suboff, vid2d, seg_group, q, table, mixing_sl, penalties_p)


def _mstep_kernel_ig(
    bounds_ref,  # SMEM scalar prefetch [n_bands * (n_super + 1)]
    suboff_ref,  # SMEM scalar prefetch [n_chunks]
    cb_hbm,  # ANY [1, n_chunks*TC] BAND-LOCAL barcode per call
    vl_hbm,  # ANY [1, n_chunks*GPC]
    q_hbm,  # ANY [1, n_chunks*TC] — (1−q)^p pre-folded (padding rows = 0)
    table_ref,  # VMEM [b_band_pad, D] this band's posterior^p rows
    out_ref,  # VMEM [D, SPS*TV]
    cb_buf,  # VMEM scratch [2, 1, TC] i32
    vl_buf,  # VMEM scratch [2, 1, GPC] i32
    q_buf,  # VMEM scratch [2, 1, TC] f32
    cb_sem,
    vl_sem,
    q_sem,
    *,
    tv: int,
    tc: int,
    n_words: int,
    n_super: int,
):
    """In-kernel posterior-gather M-step (twin of _likelihood_kernel_ig)."""
    group = max(1, tc // 128)
    gpc = tc // group
    s = pl.program_id(0)
    band = pl.program_id(1)
    at = band * (n_super + 1) + s
    lo = bounds_ref[at]
    hi = bounds_ref[at + 1]
    n = hi - lo

    def dmas(slot, ci):
        base = (lo + ci) * tc
        return (
            pltpu.make_async_copy(cb_hbm.at[:, pl.ds(base, tc)], cb_buf.at[slot], cb_sem.at[slot]),
            pltpu.make_async_copy(
                vl_hbm.at[:, pl.ds((lo + ci) * gpc, gpc)], vl_buf.at[slot], vl_sem.at[slot]
            ),
            pltpu.make_async_copy(q_hbm.at[:, pl.ds(base, tc)], q_buf.at[slot], q_sem.at[slot]),
        )

    @pl.when(band == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

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

        rows = jnp.take(table_ref[:], cb_buf[slot][0, :], axis=0)  # [TC, D]
        w = rows * q_buf[slot][0, :][:, None]  # padding rows carry q2 = 0

        # per-group sums along the call (sublane) axis -> [GPC, D]
        gw = w[0:gpc, :]
        for j in range(1, group):
            gw = gw + w[j * gpc : (j + 1) * gpc, :]

        vl = vl_buf[slot][0, :]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tv, gpc), 0)
        onehot = (col_ids == vl[None, :]).astype(jnp.float32)  # [TV, GPC]
        off = pl.multiple_of(suboff_ref[lo + ci] * tv, tv)
        # contract the group axis: gw axis 0 vs onehot axis 1 -> [D, TV]
        out_ref[:, pl.ds(off, tv)] += dot_words(gw, onehot, ((0,), (1,)), n_words, split="a")
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def tiled_mstep_inkernel_gather(
    posterior, cb_global, vl, q, chunk_bounds, chunk_suboff,
    *,
    n_variants: int, n_genotypes: int, tv: int, tc: int, sps: int,
    contribution_power: float, band_specs: tuple, interpret: bool = False,
    donor_major_out: bool = False,
):
    """Launcher for the experimental in-kernel posterior-gather M-step.

    Same argument contract as ``tiled_mstep_impl`` restricted to a
    BARCODE-banded layout (``TiledMstepCalls`` with n_bands >= 2; the power
    fold is structural — the resident table is posterior^p and q carries
    (1−q)^p with padding rows at exact 0).
    """
    if not band_specs or len(band_specs) < 2:
        raise ValueError(
            "inkernel gather needs a barcode-banded layout "
            "(TiledMstepCalls with n_bands sized for VMEM band blocks)"
        )
    if contribution_power <= 0:
        raise ValueError("inkernel gather requires contribution_power > 0")

    n_bands = len(band_specs)
    n_super = chunk_bounds.shape[0] // n_bands - 1
    gpc = tc // max(1, tc // 128)
    d = -(-n_genotypes // 8) * 8
    b_band_pad = -(-max(b_hi - b_lo for b_lo, b_hi, *_ in band_specs) // 8) * 8

    table = banded_table(
        posterior[:, :n_genotypes] ** contribution_power,
        band_specs, b_band_pad, d,
    )
    q2 = (1.0 - jnp.asarray(q)) ** contribution_power
    cb2d = jnp.asarray(cb_global).reshape(1, -1)

    check_kernel_budgets(
        "mstep-ig",
        d * sps * tv * 4
        + 2 * b_band_pad * d * 4
        + 2 * (tc * 4 + gpc * 4 + tc * 4),
        n_super * n_bands,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # cb
            pl.BlockSpec(memory_space=pl.ANY),  # vl
            pl.BlockSpec(memory_space=pl.ANY),  # q2
            pl.BlockSpec((b_band_pad, d), lambda s, k, *_: (k, 0)),  # band table
        ],
        out_specs=pl.BlockSpec((d, sps * tv), lambda s, k, *_: (0, s)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, tc), jnp.int32),
            pltpu.VMEM((2, 1, gpc), jnp.int32),
            pltpu.VMEM((2, 1, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _mstep_kernel_ig, tv=tv, tc=tc,
        n_words=_SPLIT_WORDS[KERNEL_PRECISION], n_super=n_super,
    )
    n_chunks = chunk_suboff.shape[0]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n_super * sps * tv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * 2 * d * tc * tv,
            bytes_accessed=n_chunks * tc * 12
            + n_super * n_bands * b_band_pad * d * 4
            + n_super * sps * d * tv * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bounds, chunk_suboff, cb2d, vl, q2, table)
    block = out[:n_genotypes, :n_variants]
    return block if donor_major_out else block.T


def self_test():
    """Interpret-mode numerical equality vs the mainline kernels/oracle."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from oracle import oracle_mstep

    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, tiled_logits_impl
    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls
    from demuxalot_tpu.ops.tiling import tile_barcode_calls_banded

    rng = np.random.RandomState(7)
    n_snps, n_donors, n_barcodes, n_calls = 90, 6, 200, 5000
    n_variants = n_snps * 2
    v2s = np.repeat(np.arange(n_snps, dtype=np.int32), 2)
    betas = rng.rand(n_variants, n_donors).astype(np.float32) * 10
    gprob = np.asarray(L.probs_from_betas(jnp.asarray(betas), jnp.asarray(v2s), n_snps, 0.01))
    vid = rng.randint(0, n_variants, n_calls).astype(np.int32)
    cb = np.sort(rng.randint(0, n_barcodes, n_calls)).astype(np.int32)
    q = (rng.rand(n_calls) * 0.8).astype(np.float32)
    mixing, _ = L.pseudogenotype_mixing([f"D{i}" for i in range(n_donors)], 0.3)
    pen = L.doublet_penalties(n_donors, 0.3)

    for donor_major in (False, True):
        tiled = tile_barcode_calls_banded(
            cb, vid, q, n_barcodes, n_variants=n_variants, n_bands=3,
            tile_barcodes=16, chunk_calls=128,
        )
        dev = TiledDeviceCalls(mixing, pen, tiled)
        gp = jnp.asarray(gprob.T.copy()) if donor_major else jnp.asarray(gprob)
        kwargs = dict(
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs, interpret=True,
            donor_major=donor_major,
        )
        args = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
                dev.chunk_bounds, dev.chunk_suboff)
        mainline = np.asarray(tiled_logits_impl(gp, *args, **kwargs))
        ig = np.asarray(tiled_logits_inkernel_gather(gp, *args, **kwargs))
        np.testing.assert_allclose(ig, mainline, rtol=1e-5, atol=1e-4)
        print(f"E-step IG == mainline (donor_major={donor_major}): ok")

    post = rng.rand(n_barcodes, mixing.shape[1]).astype(np.float32)
    post /= post.sum(axis=1, keepdims=True)
    order = np.argsort(vid, kind="stable")
    layout = TiledMstepCalls(
        vid[order], cb[order], q[order], n_variants,
        tile_variants=64, chunk_calls=128, n_barcodes=n_barcodes,
        n_bands=3, n_genotypes=n_donors,
    )
    assert len(layout.band_specs) >= 2
    dev_m = tuple(jnp.asarray(x) for x in (
        layout.cb_global, layout.vl, layout.q, layout.chunk_bounds, layout.chunk_suboff
    ))
    for dm_out in (False, True):
        ours = np.asarray(tiled_mstep_inkernel_gather(
            jnp.asarray(post), *dev_m,
            n_variants=n_variants, n_genotypes=n_donors,
            tv=layout.tile_variants, tc=layout.chunk_calls,
            sps=layout.subtiles_per_super, contribution_power=2.0,
            band_specs=layout.band_specs, interpret=True,
            donor_major_out=dm_out,
        ))
        if dm_out:
            ours = ours.T
        ref = oracle_mstep(post, vid, cb, q, n_variants, n_donors, 2.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
        print(f"M-step IG == oracle (donor_major_out={dm_out}): ok")


if __name__ == "__main__":
    # interpret-mode equality needs a CPU backend: under the default axon
    # TPU platform interpret dots run at TPU default precision and the
    # tolerances here fail (same forcing tests/conftest.py applies)
    jax.config.update("jax_platforms", "cpu")
    self_test()
