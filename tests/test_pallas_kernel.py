"""Pallas likelihood kernel vs the XLA path / numpy oracle (interpret mode on CPU)."""
import jax
import numpy as np
import pytest
import jax.numpy as jnp

from demuxalot_tpu.ops import likelihood as L
from demuxalot_tpu.ops.pallas_likelihood import barcode_logits_tiled
from demuxalot_tpu.ops.tiling import tile_barcode_calls
from oracle import oracle_barcode_logits, oracle_probs_from_betas


def _problem(seed=0, n_snps=100, n_donors=8, n_barcodes=100, n_calls=6000, doublet_prior=0.35):
    rng = np.random.RandomState(seed)
    n_variants = n_snps * 2
    variant2snp = np.repeat(np.arange(n_snps, dtype=np.int32), 2)
    betas = (rng.rand(n_variants, n_donors) * 50).astype(np.float32)
    vid = rng.randint(0, n_variants, n_calls).astype(np.int32)
    cb = np.sort(rng.randint(0, n_barcodes, n_calls)).astype(np.int32)
    q = (rng.rand(n_calls) * 0.5).astype(np.float32)
    names = [f"Donor{i:02}" for i in range(n_donors)]
    gprob = oracle_probs_from_betas(variant2snp, betas, 0.01)
    mixing, _ = L.pseudogenotype_mixing(names, doublet_prior)
    penalties = L.doublet_penalties(n_donors, doublet_prior)
    ref_logits, _ = oracle_barcode_logits(names, gprob, vid, cb, q, n_barcodes, doublet_prior)
    return gprob, mixing, penalties, vid, cb, q, n_barcodes, ref_logits


def test_tiling_layout_roundtrip():
    rng = np.random.RandomState(1)
    n, B = 5000, 300
    cb = np.sort(rng.randint(0, B, n)).astype(np.int32)
    vid = rng.randint(0, 50, n).astype(np.int32)
    q = rng.rand(n).astype(np.float32)
    tiled = tile_barcode_calls(cb, vid, q, B, tile_barcodes=32, chunk_calls=128)
    assert tiled.n_tiles == -(-B // 32)
    # every real call appears exactly once with the right tile-local barcode
    from demuxalot_tpu.ops.tiling import per_call_segments

    real = tiled.q.reshape(-1) < 1.0
    got_global_cb = (
        np.repeat(tiled.chunk2tile, tiled.chunk_calls) * tiled.tile_barcodes
        + per_call_segments(tiled)
    )[real]
    np.testing.assert_array_equal(np.sort(got_global_cb), np.sort(cb[q < 1.0]))
    # padding rows are exact no-ops (q == 1)
    n_real = int(real.sum())
    assert n_real == int((q < 1.0).sum())


@pytest.mark.parametrize("doublet_prior", [0.0, 0.35])
def test_pallas_kernel_matches_oracle(doublet_prior):
    gprob, mixing, penalties, vid, cb, q, n_barcodes, ref_logits = _problem(
        doublet_prior=doublet_prior
    )
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    ours = np.asarray(
        barcode_logits_tiled(jnp.asarray(gprob), mixing, penalties, tiled, interpret=True)
    )
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("n_donors", [64, 72])
def test_pallas_kernel_stack_k_boundary(n_donors):
    """Donor counts at/over the stacked-K limit (d_pad·n_words = 128).

    64 donors is the last configuration the one-pass stacked expansion
    serves at f32x2; 72 donors (d_pad 72 -> 144 > 128) must fall back to
    summed word passes. Both must match the oracle. Doublet columns off to
    keep the oracle loop tractable at this width.
    """
    gprob, mixing, penalties, vid, cb, q, n_barcodes, ref_logits = _problem(
        n_donors=n_donors, n_calls=2000, n_barcodes=50, doublet_prior=0.0
    )
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    ours = np.asarray(
        barcode_logits_tiled(jnp.asarray(gprob), mixing, penalties, tiled, interpret=True)
    )
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("doublet_prior", [0.0, 0.35])
def test_in_kernel_softmax_matches_xla(doublet_prior):
    """softmax_out=True returns (logits, probs) == separate XLA softmax."""
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, tiled_logits_impl

    gprob, mixing, penalties, vid, cb, q, n_barcodes, _ref = _problem(
        doublet_prior=doublet_prior
    )
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    dev = TiledDeviceCalls(mixing, penalties, tiled)
    n_pg = mixing.shape[1]
    logits, probs = tiled_logits_impl(
        jnp.asarray(gprob), dev.mixing_sl, dev.penalties_p, dev.vid,
        dev.seg_group, dev.q, dev.chunk_bounds, dev.chunk_suboff,
        n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
        tc=dev.chunk_calls, band_specs=dev.band_specs, interpret=True,
        softmax_out=True, n_pseudogenotypes=n_pg,
    )
    logits = np.asarray(logits)[:n_barcodes, :n_pg]
    probs = np.asarray(probs)[:n_barcodes, :n_pg]
    expect = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(probs, expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_pallas_kernel_empty_tiles_initialized():
    # barcodes with no calls at all must still get penalty-initialized logits
    gprob, mixing, penalties, vid, cb, q, n_barcodes, ref_logits = _problem(
        n_calls=50, n_barcodes=200
    )
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=64)
    ours = np.asarray(
        barcode_logits_tiled(jnp.asarray(gprob), mixing, penalties, tiled, interpret=True)
    )
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=5e-3)
    empty_barcodes = np.setdiff1d(np.arange(n_barcodes), cb)
    assert len(empty_barcodes) > 0
    np.testing.assert_allclose(ours[empty_barcodes], np.broadcast_to(penalties, (len(empty_barcodes), len(penalties))), atol=1e-6)


def test_demultiplexer_pallas_path_matches_xla(tmp_path):
    """Force the Pallas forward inside Demultiplexer and compare posteriors."""
    import numpy as np
    from demuxalot_tpu import BarcodeHandler, Demultiplexer
    from demuxalot_tpu.sim import generate_bam_file
    from demuxalot_tpu.frontend.snp_counter import count_snps

    np.random.seed(3)
    filename = str(tmp_path / "t.bam")
    filename, genotypes, _ids, names = generate_bam_file(
        filename, n_genotypes=4, n_barcodes=80, n_reads_per_barcode=30,
        chromosome2length={"chr1": 600},
    )
    bh = BarcodeHandler(list(names))
    calls = count_snps(
        filename, genotypes.get_chromosome2positions(), bh,
        joblib_n_jobs=None, joblib_verbosity=0,
    )
    try:
        Demultiplexer.use_pallas = False
        logits_x, probs_x = Demultiplexer.predict_posteriors(calls, genotypes, bh, doublet_prior=0.25)
        lx, px = Demultiplexer.learn_genotypes(calls, genotypes, bh, n_iterations=2)
        Demultiplexer.use_pallas = True
        # the production Pallas EM keeps its state donor-major [D, V]
        # whenever the windowed denominator applies — pin that here so this
        # parity test is known to cover the donor-major path
        from demuxalot_tpu.models.demux import _EMRun

        run = _EMRun(calls, genotypes, bh, 2, 0.01, 0.0, None)
        assert run.donor_major, "expected the donor-major EM state here"
        logits_p, probs_p = Demultiplexer.predict_posteriors(calls, genotypes, bh, doublet_prior=0.25)
        lp, pp = Demultiplexer.learn_genotypes(calls, genotypes, bh, n_iterations=2)
        # the env-gated in-kernel softmax EM must match the default exactly
        import os
        os.environ["DEMUX_EM_FUSED_SOFTMAX"] = "1"
        try:
            lf, pf = Demultiplexer.learn_genotypes(calls, genotypes, bh, n_iterations=2)
        finally:
            del os.environ["DEMUX_EM_FUSED_SOFTMAX"]
    finally:
        Demultiplexer.use_pallas = None
    np.testing.assert_allclose(logits_p.values, logits_x.values, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(probs_p.values, probs_x.values, atol=1e-5)
    np.testing.assert_allclose(lp.variant_betas, lx.variant_betas, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(pf.values, pp.values, atol=1e-5)
    np.testing.assert_allclose(lf.variant_betas, lp.variant_betas, rtol=1e-5, atol=1e-5)


def test_donor_major_layouts_match_row_major():
    """[D, V] genotype tables / M-step outputs equal the [V, D] paths."""
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls
    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls

    gprob, mixing, penalties, vid, cb, q, n_barcodes, ref_logits = _problem()
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    dev = TiledDeviceCalls(mixing, penalties, tiled)
    row = np.asarray(dev.logits(jnp.asarray(gprob), interpret=True))
    dm = np.asarray(
        dev.logits(jnp.asarray(np.ascontiguousarray(gprob.T)), interpret=True, donor_major=True)
    )
    np.testing.assert_allclose(dm, row, rtol=1e-6, atol=1e-6)

    rng = np.random.RandomState(5)
    n_variants, n_donors = gprob.shape
    n_pg = mixing.shape[1]
    post = rng.rand(n_barcodes, n_pg).astype(np.float32)
    order = np.argsort(vid, kind="stable")
    layout = TiledMstepCalls(
        vid[order], cb[order], q[order], n_variants, tile_variants=64, chunk_calls=128
    )
    row_m = np.asarray(layout.addition(jnp.asarray(post), n_genotypes=n_donors,
                                       contribution_power=2.0, interpret=True))
    dm_m = np.asarray(layout.addition(jnp.asarray(post), n_genotypes=n_donors,
                                      contribution_power=2.0, interpret=True,
                                      donor_major_out=True))
    np.testing.assert_array_equal(dm_m.T, row_m)

    # donor-major windowed genotype probs equal the row-major op
    variant2snp = np.repeat(np.arange(n_variants // 2, dtype=np.int32), 2)
    betas = (rng.rand(n_variants, n_donors) * 50).astype(np.float32)
    row_p = np.asarray(
        L.probs_from_betas(jnp.asarray(betas), jnp.asarray(variant2snp),
                           n_variants // 2, 0.01, max_per_snp=2)
    )
    dm_p = np.asarray(
        L.probs_from_betas_donor_major(
            jnp.asarray(np.ascontiguousarray(betas.T)), jnp.asarray(variant2snp),
            0.01, max_per_snp=2,
        )
    )
    np.testing.assert_allclose(dm_p.T, row_p, rtol=1e-6, atol=1e-7)


def test_pallas_mstep_matches_oracle():
    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls
    from oracle import oracle_mstep

    rng = np.random.RandomState(13)
    n_variants, n_donors, n_barcodes, n_calls = 300, 6, 150, 20000
    vid = rng.randint(0, n_variants, n_calls).astype(np.int32)
    cb = rng.randint(0, n_barcodes, n_calls).astype(np.int32)
    q = (rng.rand(n_calls) * 0.7).astype(np.float32)
    n_pg = n_donors + n_donors * (n_donors - 1) // 2
    post = rng.rand(n_barcodes, n_pg).astype(np.float32)
    post /= post.sum(axis=1, keepdims=True)

    order = np.argsort(vid, kind="stable")
    layout = TiledMstepCalls(
        vid[order], cb[order], q[order], n_variants, tile_variants=64, chunk_calls=128
    )
    from demuxalot_tpu.ops.pallas_mstep import tiled_mstep_impl

    dev = tuple(jnp.asarray(x) for x in (
        layout.cb_global, layout.vl, layout.q, layout.chunk_bounds, layout.chunk_suboff
    ))
    for power in (2.0, 1.0):
        # both sides of the power fold (table^p·(1−q)^p vs (table·(1−q))^p)
        # must match the oracle; padding stays an exact no-op in each
        for fold in (True, False):
            ours = np.asarray(tiled_mstep_impl(
                jnp.asarray(post), *dev,
                n_variants=n_variants, n_genotypes=n_donors,
                tv=layout.tile_variants, tc=layout.chunk_calls,
                sps=layout.subtiles_per_super, contribution_power=power,
                band_specs=layout.band_specs, interpret=True, fold_power=fold,
            ))
            ref = oracle_mstep(post, vid, cb, q, n_variants, n_donors, power)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_banded_layout_matches_unbanded():
    """Variant-banded kernel layout == single-band result (interpret mode)."""
    import jax.numpy as jnp

    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls
    from demuxalot_tpu.ops.tiling import tile_barcode_calls, tile_barcode_calls_banded

    rng = np.random.RandomState(11)
    n_variants, n_donors, n_barcodes, n_calls = 300, 6, 96, 4000
    gp = jnp.asarray(rng.uniform(0.01, 0.99, size=(n_variants, n_donors)).astype(np.float32))
    mixing, _ = L.pseudogenotype_mixing([f"D{i}" for i in range(n_donors)], 0.3)
    pen = L.doublet_penalties(n_donors, 0.3)
    cb = np.sort(rng.randint(0, n_barcodes, n_calls)).astype(np.int32)
    vid = rng.randint(0, n_variants, n_calls).astype(np.int32)
    q = rng.uniform(1e-4, 0.6, n_calls).astype(np.float32)

    plain = TiledDeviceCalls(
        mixing, pen, tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    )
    banded = TiledDeviceCalls(
        mixing, pen,
        tile_barcode_calls_banded(
            cb, vid, q, n_barcodes, n_variants=n_variants, n_bands=4,
            tile_barcodes=16, chunk_calls=128,
        ),
    )
    a = np.asarray(plain.logits(gp, interpret=True))
    b = np.asarray(banded.logits(gp, interpret=True))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_mstep_barcode_banding_matches_unbanded():
    """Barcode-banded M-step layout == single-band result (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls

    rng = np.random.RandomState(13)
    n_variants, n_donors, n_barcodes, n_calls = 200, 6, 120, 3000
    vid = np.sort(rng.randint(0, n_variants, n_calls)).astype(np.int32)
    cb = rng.randint(0, n_barcodes, n_calls).astype(np.int32)
    q = rng.uniform(1e-4, 0.6, n_calls).astype(np.float32)
    posterior = jax.nn.softmax(
        jnp.asarray(rng.randn(n_barcodes, n_donors + 3).astype(np.float32)), axis=1
    )

    plain = TiledMstepCalls(vid, cb, q, n_variants, tile_variants=128, chunk_calls=128)
    banded = TiledMstepCalls(
        vid, cb, q, n_variants, tile_variants=128, chunk_calls=128,
        n_barcodes=n_barcodes, n_bands=3,
    )
    a = np.asarray(plain.addition(posterior, n_donors, 2.0, interpret=True))
    b = np.asarray(banded.addition(posterior, n_donors, 2.0, interpret=True))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


def test_launch_grids_stay_under_cap():
    """Layouts must keep n_super * n_bands under tiling.GRID_CAP at any scale

    (this environment's remote Mosaic compile wedges on large launch grids).
    Checked at PMBC-like and million-barcode M-step scales via layout math
    only — no kernel launch.
    """
    from demuxalot_tpu.ops.pallas_mstep import (
        TiledMstepCalls, choose_mstep_bands, choose_tile_variants,
    )
    from demuxalot_tpu.ops.tiling import (
        GRID_CAP, cap_bands_to_grid, choose_n_bands, choose_subtiles_per_super,
    )

    # E-step at PMBC scale: 655k variants, 32 donors, 65k barcodes, TB=32
    n_variants, n_donors, n_barcodes, tb, pgp = 655_360, 32, 65_536, 32, 640
    n_tiles = -(-n_barcodes // tb)
    n_bands = cap_bands_to_grid(choose_n_bands(n_variants, n_donors), n_tiles, tb, pgp)
    n_chunks = 9_400_000 // 512 // n_bands
    sps = choose_subtiles_per_super(n_tiles, n_chunks, tb, pgp, n_bands=n_bands)
    n_super = -(-n_tiles // sps)
    assert n_super * n_bands <= GRID_CAP
    assert n_bands > 1  # cap must not destroy banding at the measured scale

    # M-step at 1M barcodes x 655k variants (layout construction end-to-end)
    rng = np.random.RandomState(5)
    n_calls = 50_000
    vid = np.sort(rng.randint(0, n_variants, n_calls)).astype(np.int32)
    cb = rng.randint(0, 1_000_000, n_calls).astype(np.int32)
    q = rng.rand(n_calls).astype(np.float32)
    layout = TiledMstepCalls(
        vid, cb, q, n_variants,
        tile_variants=choose_tile_variants(n_calls, n_variants),
        n_barcodes=1_000_000,
        n_bands=choose_mstep_bands(1_000_000, n_donors),
        n_genotypes=n_donors,
    )
    n_bands_m = max(1, len(layout.band_specs))
    assert layout.n_super * n_bands_m <= GRID_CAP


def test_kernel_budget_guards():
    """VMEM overruns and oversized launch grids fail fast with clear errors."""
    import pytest
    from demuxalot_tpu.ops.tiling import GRID_CAP, check_kernel_budgets

    check_kernel_budgets("ok", 5_000_000, 64)  # production-sized: silent
    with pytest.raises(ValueError, match="VMEM"):
        check_kernel_budgets("big", 200_000_000, 64)
    with pytest.raises(ValueError, match="GRID_CAP"):
        check_kernel_budgets("wide", 1_000_000, 2 * GRID_CAP + 1)
    # gray zone: warns but does not raise (VMEM-constrained layouts)
    check_kernel_budgets("gray", 1_000_000, GRID_CAP + 1)


def test_log_product_fold_matches_log_then_add(monkeypatch):
    """Width-8 product-before-log == the unfolded log-then-add kernel.

    Σ log(arg) = log(Π arg) exactly; in f32 the two orderings may differ by
    rounding only. Padding args are exactly 1, so the fold must keep padding
    an exact no-op (covered by the groupwise comparison on a workload with
    ragged per-barcode call counts).
    """
    from demuxalot_tpu.ops import pallas_likelihood as PL

    gprob, mixing, penalties, vid, cb, q, n_barcodes, _ = _problem(
        n_calls=3000, n_barcodes=96
    )
    # tc=512 -> group=4: the fold actually multiplies columns
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=512)
    dev = PL.TiledDeviceCalls(mixing, penalties, tiled)
    args = (jnp.asarray(gprob), dev.mixing_sl, dev.penalties_p, dev.vid,
            dev.seg_group, dev.q, dev.chunk_bounds, dev.chunk_suboff)
    common = dict(n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
                  tc=dev.chunk_calls, band_specs=dev.band_specs, interpret=True)

    monkeypatch.setattr(PL, "_LOG_FOLD_WIDTH", 8)
    folded = np.asarray(PL.tiled_logits_impl(*args, **common))
    monkeypatch.setattr(PL, "_LOG_FOLD_WIDTH", 1)
    unfolded = np.asarray(PL.tiled_logits_impl(*args, **common))
    # real columns: rounding-order difference only (same order as the
    # split-word error). Padding columns (>= n_pg, sliced off by every
    # consumer) legitimately differ: their args are exactly 0, and the fold
    # hits the 1e-30 floor once per sub-product instead of once per log.
    n_pg = mixing.shape[1]
    np.testing.assert_allclose(
        folded[:, :n_pg], unfolded[:, :n_pg], rtol=0, atol=1e-4
    )
    assert np.isfinite(folded).all()


def test_softmax_out_budget_counts_second_block(monkeypatch):
    """softmax_out keeps TWO resident (tbs, pgp) out blocks; the VMEM guard
    must charge both, or an undersized-by-one-block layout passes the guard
    and dies on device as the remote Mosaic failure the guard exists to
    prevent."""
    from demuxalot_tpu.ops import tiling
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, tiled_logits_impl

    gprob, mixing, penalties, vid, cb, q, n_barcodes, _ = _problem()
    tiled = tile_barcode_calls(cb, vid, q, n_barcodes, tile_barcodes=16, chunk_calls=128)
    dev = TiledDeviceCalls(mixing, penalties, tiled)
    n_pg = mixing.shape[1]

    seen = []
    real_check = tiling.check_kernel_budgets

    def spy(kernel, vmem_bytes, n_grid_steps):
        seen.append(vmem_bytes)
        real_check(kernel, vmem_bytes, n_grid_steps)

    monkeypatch.setattr(tiling, "check_kernel_budgets", spy)
    common = dict(
        n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
        tc=dev.chunk_calls, band_specs=dev.band_specs, interpret=True,
    )
    args = (jnp.asarray(gprob), dev.mixing_sl, dev.penalties_p, dev.vid,
            dev.seg_group, dev.q, dev.chunk_bounds, dev.chunk_suboff)
    tiled_logits_impl(*args, **common)
    tiled_logits_impl(*args, **common, softmax_out=True, n_pseudogenotypes=n_pg)
    assert len(seen) == 2
    pgp = dev.penalties_p.shape[1]
    # the probs block counts TWICE: Mosaic pipeline-double-buffers every
    # output block (measured: a 1x-counted softmax layout OOMed scoped
    # VMEM at exactly 4x tbs*pgp*4)
    assert seen[1] - seen[0] == 2 * dev.tbs * pgp * 4


@pytest.mark.parametrize("trial", range(4))
def test_banded_layout_randomized_invariants(trial):
    """Randomized layout torture: reconstruct every call from the banded slots.

    The tiling layouts are the subtlest host code feeding the kernels; a
    slot mapping bug shows up on device as silently-wrong logits. For
    random shapes (odd barcode/variant counts, skewed call distributions,
    empty bands/tiles) check that the banded layout (a) holds every real
    call exactly once with its (barcode, variant, q) triple intact, (b)
    pads with exact no-ops (q == 1), (c) keeps chunks band-major and
    tile-ordered as chunk_bounds derivation assumes.
    """
    from demuxalot_tpu.ops.tiling import per_call_segments, tile_barcode_calls_banded

    rng = np.random.RandomState(100 + trial)
    n_barcodes = int(rng.randint(3, 400))
    n_variants = int(rng.randint(2, 700))
    n_bands = int(rng.randint(1, 6))
    tb = int(rng.choice([8, 16, 32]))
    tc = int(rng.choice([128, 256]))
    n_calls = int(rng.randint(0, 5000))
    # skewed barcodes: some barcodes carry most calls, many carry none
    cb = np.sort(
        (rng.zipf(1.7, n_calls).clip(1, n_barcodes) - 1).astype(np.int32)
    )
    vid = rng.randint(0, n_variants, n_calls).astype(np.int32)
    q = rng.uniform(0.0, 0.9, n_calls).astype(np.float32)

    tiled = tile_barcode_calls_banded(
        cb, vid, q, n_barcodes, n_variants=n_variants, n_bands=n_bands,
        tile_barcodes=tb, chunk_calls=tc,
    )

    q_flat = np.asarray(tiled.q).reshape(-1)
    vid_flat = np.asarray(tiled.vid).reshape(-1)
    real = q_flat < 1.0

    # (c) band-major chunk regions; within a band, chunk2tile non-decreasing
    offs = tiled.band_chunk_offsets
    assert offs[0] == 0 and offs[-1] == tiled.n_chunks
    for k in range(tiled.n_bands):
        seg = tiled.chunk2tile[offs[k]:offs[k + 1]]
        assert np.all(np.diff(seg) >= 0)

    # reconstruct each slot's global (barcode, variant)
    band_of_chunk = np.searchsorted(offs, np.arange(tiled.n_chunks), side="right") - 1
    slot_band = np.repeat(band_of_chunk, tc)
    got_vid = vid_flat + tiled.band_edges[slot_band]
    got_cb = (
        np.repeat(tiled.chunk2tile, tc) * tb + per_call_segments(tiled)
    )

    # (a) multiset equality of (cb, vid, q) triples
    want = np.stack([cb, vid, np.round(q * 1e6)], axis=1)
    got = np.stack([got_cb[real], got_vid[real], np.round(q_flat[real] * 1e6)], axis=1)
    order_w = np.lexsort(want.T)
    order_g = np.lexsort(got.T)
    np.testing.assert_array_equal(got[order_g], want[order_w])
    # (b) padding is exactly q == 1
    assert int(real.sum()) == n_calls
    np.testing.assert_array_equal(q_flat[~real], 1.0)


def test_adaptive_chunk_calls_tracks_skew():
    """choose_chunk_calls_from_counts: uniform fills reward big chunks
    (group padding is free when counts divide G), heavy-tailed fills
    must not (most segments round up to a whole group of G)."""
    from demuxalot_tpu.ops.tiling import choose_chunk_calls_from_counts

    uniform = np.full(65_536, 64, dtype=np.int64)
    tc_uniform = choose_chunk_calls_from_counts(uniform, tile_barcodes=64)
    assert tc_uniform >= 2048

    # 90% tiny segments (3 calls), 10% heavy tails — at G = 32 each tiny
    # segment pads 3 -> 32; the chooser must back off to small groups
    rng = np.random.default_rng(0)
    skewed = np.where(rng.random(65_536) < 0.9, 3, 600).astype(np.int64)
    tc_skewed = choose_chunk_calls_from_counts(skewed, tile_barcodes=64)
    assert tc_skewed < tc_uniform  # backs off when group padding bites
    assert tc_skewed <= 1024

    # the choice must reproduce tile_barcode_calls' real slot count: verify
    # the estimate against the actual layout at the chosen size
    cb = np.repeat(np.arange(256), np.maximum(skewed[:256], 1))
    tiled = tile_barcode_calls(
        cb, np.zeros_like(cb, dtype=np.int32),
        np.zeros(len(cb), dtype=np.float32), 256,
        tile_barcodes=64, chunk_calls=tc_skewed,
    )
    g = tiled.group
    padded = -(-np.maximum(skewed[:256], 1) // g) * g
    tile_slots = padded.reshape(-1, 64).sum(axis=1)
    expect_chunks = int(np.maximum(1, -(-tile_slots // tc_skewed)).sum())
    assert tiled.n_chunks == expect_chunks


def test_adaptive_chunk_sentinel_with_banding():
    """chunk_calls = 0 (adaptive) must also work when the layout bands the
    variant axis — the banded chooser takes its ceiling from the default."""
    import jax.numpy as jnp

    from demuxalot_tpu.models.demux import _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE

    rng = np.random.default_rng(0)
    n_barcodes, n_calls, n_variants = 256, 4096, 3_000_000  # forces bands
    rec = np.recarray(n_calls, dtype=BARCODE_CALLS_DTYPE)
    rec["compressed_cb"] = rng.integers(0, n_barcodes, n_calls)
    rec["variant_id"] = rng.integers(0, n_variants, n_calls)
    rec["p_base_wrong"] = rng.random(n_calls, dtype=np.float32) * 0.4
    rec["snp_id"] = rec["variant_id"] // 2
    mixing, _ = L.pseudogenotype_mixing(["A", "B", "C"], 0.35)
    penalties = L.doublet_penalties(3, 0.35)
    dev = _PallasLogits(
        rec, n_barcodes, mixing, penalties,
        tile_barcodes=64, chunk_calls=0, n_variants=n_variants,
    ).device
    assert len(dev.band_specs) > 1  # banding actually engaged
    assert dev.chunk_calls >= 128


@pytest.mark.parametrize("n_donors,seed", [(8, 31), (24, 32), (64, 33)])
def test_full_stack_parity_fuzz(n_donors, seed):
    """Randomized full-stack parity: Pallas vs XLA posteriors, donor sweep.

    Drives the PUBLIC pipeline (synthetic calls -> pack -> predict/learn)
    at randomized shapes through both device paths. 64 donors crosses the
    stacked-K boundary (n_words * D_pad > 128 disables dot_words_stacked)
    and blows the pseudo-genotype axis up to 2080 columns — regimes the
    fixed-shape integration test never touches.
    """
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "benchmarks"))
    # synth_calls is side-effect free; at_scale_quality probes the TPU
    # tunnel at import (15 min hang under a relay outage) — never import
    # that module from the default suite
    from synth_calls import synthesize_compressed_calls

    from demuxalot_tpu import BarcodeHandler, Demultiplexer

    rng = np.random.RandomState(seed)
    n_barcodes = int(rng.randint(150, 400))
    n_snps = int(rng.randint(200, 800))
    cpb = int(rng.randint(8, 40))
    genotypes, calls, _truth, _names = synthesize_compressed_calls(
        n_barcodes, n_donors, n_snps, cpb, seed=seed
    )
    bh = BarcodeHandler([f"BC{b:06}" for b in range(n_barcodes)])
    try:
        Demultiplexer.use_pallas = False
        _lx, probs_x = Demultiplexer.predict_posteriors(
            calls, genotypes, bh, doublet_prior=0.3
        )
        gx, px = Demultiplexer.learn_genotypes(calls, genotypes, bh, n_iterations=2)
        Demultiplexer.use_pallas = True
        _lp, probs_p = Demultiplexer.predict_posteriors(
            calls, genotypes, bh, doublet_prior=0.3
        )
        gp, pp = Demultiplexer.learn_genotypes(calls, genotypes, bh, n_iterations=2)
    finally:
        Demultiplexer.use_pallas = None
    np.testing.assert_allclose(probs_p.values, probs_x.values, atol=2e-5)
    # EM feeds the split-word kernel's ~3e-5 posterior error back through
    # the M-step, so two iterations compound it slightly
    np.testing.assert_allclose(pp.values, px.values, atol=1e-4)
    np.testing.assert_allclose(
        gp.variant_betas[: gp.n_variants], gx.variant_betas[: gx.n_variants],
        rtol=1e-4, atol=1e-2,
    )


def test_packed_calls_pallas_path(tmp_path):
    """PackedCalls layout caches drive the Pallas path bit-identically.

    Covers the forward_layout / mstep_layout caches (the XLA flat cache is
    covered in tests/test_synthetic.py): same posteriors and learnt betas
    as per-call packing, cache hit counts as expected across the
    learn -> predict-on-learnt flow.
    """
    import os

    import numpy as np
    from demuxalot_tpu import BarcodeHandler, Demultiplexer, PackedCalls
    from demuxalot_tpu.frontend.snp_counter import count_snps
    from demuxalot_tpu.sim import generate_bam_file

    np.random.seed(7)
    filename = str(tmp_path / "t.bam")
    filename, genotypes, _ids, names = generate_bam_file(
        filename, n_genotypes=4, n_barcodes=60, n_reads_per_barcode=30,
        chromosome2length={"chr1": 600},
    )
    bh = BarcodeHandler(list(names))
    calls = count_snps(
        filename, genotypes.get_chromosome2positions(), bh,
        joblib_n_jobs=None, joblib_verbosity=0,
    )
    os.environ["DEMUX_HOST_SOFTMAX"] = "1"
    prev_use_pallas = Demultiplexer.use_pallas
    try:
        Demultiplexer.use_pallas = True
        learnt_ref, probs_ref = Demultiplexer.learn_genotypes(
            calls, genotypes, bh, n_iterations=2
        )
        packed = PackedCalls(calls, genotypes)
        learnt_p, probs_p = Demultiplexer.learn_genotypes(
            packed, genotypes, bh, n_iterations=2
        )
        np.testing.assert_array_equal(probs_ref.values, probs_p.values)
        np.testing.assert_array_equal(
            learnt_ref.get_betas(), learnt_p.get_betas()
        )
        # EM (doublet_prior=0) built one forward layout + one M-step layout
        assert len(packed._forward_layouts) == 1
        assert len(packed._mstep_layouts) == 1

        lg_ref, _pr = Demultiplexer.predict_posteriors(
            calls, learnt_ref, bh, doublet_prior=0.25
        )
        lg_p, _pp = Demultiplexer.predict_posteriors(
            packed, learnt_p, bh, doublet_prior=0.25
        )
        np.testing.assert_array_equal(lg_ref.values, lg_p.values)
        # predict's doublet mixing differs from the EM layout -> second VIEW,
        # but the host tiling + uploaded call stream are built exactly once
        # and shared across pseudo-genotype widths (r5: pgp-independent
        # layout; bands/chunks sized at the donor count's max width)
        assert len(packed._forward_layouts) == 2
        assert len(packed._host_tilings) == 1
        views = list(packed._forward_layouts.values())
        assert views[0].device.vid is views[1].device.vid
        assert views[0].device.q is views[1].device.q
        # a repeat predict is a pure cache hit
        Demultiplexer.predict_posteriors(packed, learnt_p, bh, doublet_prior=0.25)
        assert len(packed._forward_layouts) == 2
        assert len(packed._host_tilings) == 1
        # clear() drops layouts but keeps the pack; next use rebuilds
        packed.clear()
        assert not packed._forward_layouts and not packed._host_tilings
        lg_c, _ = Demultiplexer.predict_posteriors(packed, learnt_p, bh, doublet_prior=0.25)
        np.testing.assert_array_equal(lg_c.values, lg_p.values)
    finally:
        Demultiplexer.use_pallas = prev_use_pallas
        os.environ["DEMUX_HOST_SOFTMAX"] = "0"  # conftest default
