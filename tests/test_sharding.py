"""Multi-device tests on the virtual 8-device CPU mesh.

The sharded path must produce the same posteriors and learnt betas as the
single-device Demultiplexer.
"""
import jax
import numpy as np
import pytest

from demuxalot_tpu import BarcodeHandler, Demultiplexer
from demuxalot_tpu.parallel import ShardedDemultiplexer, make_mesh
from demuxalot_tpu.sim import generate_bam_file
from demuxalot_tpu.frontend.snp_counter import count_snps


@pytest.fixture(scope="module")
def small_problem(tmp_path_factory):
    np.random.seed(7)
    filename = str(tmp_path_factory.mktemp("bam") / "t.bam")
    filename, genotypes, _ids, barcode2donor_names = generate_bam_file(
        filename, n_genotypes=6, n_barcodes=200, n_reads_per_barcode=40,
        chromosome2length={"chr1": 800, "chr2": 800},
    )
    barcode_handler = BarcodeHandler(list(barcode2donor_names))
    calls = count_snps(
        filename,
        chromosome2positions=genotypes.get_chromosome2positions(),
        barcode_handler=barcode_handler,
        joblib_n_jobs=None,
        joblib_verbosity=0,
    )
    return genotypes, barcode_handler, calls


def test_mesh_has_8_devices():
    assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"


@pytest.mark.parametrize("doublet_prior", [0.0, 0.35])
def test_sharded_predict_matches_single_device(small_problem, doublet_prior):
    genotypes, barcode_handler, calls = small_problem
    logits1, probs1 = Demultiplexer.predict_posteriors(
        calls, genotypes, barcode_handler, doublet_prior=doublet_prior
    )
    sharded = ShardedDemultiplexer(make_mesh())
    logits8, probs8 = sharded.predict_posteriors(
        calls, genotypes, barcode_handler, doublet_prior=doublet_prior
    )
    assert list(logits1.columns) == list(logits8.columns)
    np.testing.assert_allclose(logits8.values, logits1.values, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(probs8.values, probs1.values, atol=1e-5)
    # identical assignments
    assert (probs1.idxmax(axis=1) == probs8.idxmax(axis=1)).all()


def test_sharded_em_matches_single_device(small_problem):
    genotypes, barcode_handler, calls = small_problem
    learnt1, probs1 = Demultiplexer.learn_genotypes(
        calls, genotypes, barcode_handler, n_iterations=3
    )
    sharded = ShardedDemultiplexer(make_mesh())
    learnt8, probs8 = sharded.learn_genotypes(calls, genotypes, barcode_handler, n_iterations=3)

    np.testing.assert_allclose(probs8.values, probs1.values, atol=1e-4)
    np.testing.assert_allclose(
        learnt8.variant_betas, learnt1.variant_betas, rtol=1e-4, atol=1e-2
    )
    assert (probs1.idxmax(axis=1) == probs8.idxmax(axis=1)).all()


def test_sharded_anchored_damping_matches_single_device(small_problem):
    """damping="anchor" must behave identically on the sharded engine."""
    genotypes, barcode_handler, calls = small_problem
    ng = genotypes.clone()
    snp_ids = ng.get_snp_ids_for_variants()
    rng = np.random.RandomState(9)
    erased_rows = np.nonzero((rng.rand(snp_ids.max() + 1) < 0.9)[snp_ids])[0]
    ng.variant_betas[erased_rows, :] = 0

    learnt1, probs1 = Demultiplexer.learn_genotypes(
        calls, ng, barcode_handler, n_iterations=3, damping="anchor"
    )
    sharded = ShardedDemultiplexer(make_mesh())
    learnt8, probs8 = sharded.learn_genotypes(
        calls, ng, barcode_handler, n_iterations=3, damping="anchor"
    )
    np.testing.assert_allclose(probs8.values, probs1.values, atol=1e-4)
    np.testing.assert_allclose(
        learnt8.variant_betas, learnt1.variant_betas, rtol=1e-4, atol=1e-2
    )
    # erased variants received no addition on either engine
    assert np.all(learnt8.get_betas()[erased_rows] == ng.get_betas()[erased_rows])
    with pytest.raises(ValueError):
        sharded.learn_genotypes(calls, ng, barcode_handler, damping="bogus")


def test_sharded_em_with_prior_logits(small_problem):
    genotypes, barcode_handler, calls = small_problem
    empty = genotypes.clone()
    empty.variant_betas[:] = 0
    n_options = genotypes.n_genotypes
    rng = np.random.RandomState(0)
    prior = np.zeros((barcode_handler.n_barcodes, n_options), dtype=np.float32)
    labeled = rng.rand(barcode_handler.n_barcodes) < 0.5
    prior[labeled, rng.randint(0, n_options, labeled.sum())] = 100.0

    learnt1, probs1 = Demultiplexer.learn_genotypes(
        calls, empty, barcode_handler, n_iterations=2, barcode_prior_logits=prior
    )
    sharded = ShardedDemultiplexer(make_mesh())
    learnt8, probs8 = sharded.learn_genotypes(
        calls, empty, barcode_handler, n_iterations=2, barcode_prior_logits=prior
    )
    np.testing.assert_allclose(probs8.values, probs1.values, atol=1e-4)
    np.testing.assert_allclose(learnt8.variant_betas, learnt1.variant_betas, rtol=1e-4, atol=1e-2)


def test_sharded_pallas_estep_matches(small_problem):
    """Force the per-shard Pallas kernel (interpret on CPU) across 8 devices."""
    genotypes, barcode_handler, calls = small_problem
    logits1, probs1 = Demultiplexer.predict_posteriors(
        calls, genotypes, barcode_handler, doublet_prior=0.35
    )
    sharded = ShardedDemultiplexer(make_mesh())
    try:
        sharded.use_pallas = True
        logits8, probs8 = sharded.predict_posteriors(
            calls, genotypes, barcode_handler, doublet_prior=0.35
        )
        learnt8, probsL8 = sharded.learn_genotypes(calls, genotypes, barcode_handler, n_iterations=2)
    finally:
        sharded.use_pallas = None
    np.testing.assert_allclose(logits8.values, logits1.values, rtol=1e-4, atol=5e-3)
    assert (probs1.idxmax(axis=1) == probs8.idxmax(axis=1)).all()

    learnt1, probsL1 = Demultiplexer.learn_genotypes(calls, genotypes, barcode_handler, n_iterations=2)
    np.testing.assert_allclose(learnt8.variant_betas, learnt1.variant_betas, rtol=1e-4, atol=1e-2)


def test_sharded_scan_path(small_problem):
    """Force the chunked-scan code path (n_calls > call_chunk) under shard_map."""
    genotypes, barcode_handler, calls = small_problem
    learnt1, probs1 = Demultiplexer.learn_genotypes(calls, genotypes, barcode_handler, n_iterations=2)
    sharded = ShardedDemultiplexer(make_mesh())
    try:
        sharded.call_chunk = 256  # far below the call count
        learnt8, probs8 = sharded.learn_genotypes(calls, genotypes, barcode_handler, n_iterations=2)
    finally:
        sharded.call_chunk = type(sharded).call_chunk
    np.testing.assert_allclose(probs8.values, probs1.values, atol=1e-4)
    np.testing.assert_allclose(learnt8.variant_betas, learnt1.variant_betas, rtol=1e-4, atol=1e-2)


def test_put_row_shards_assembles_global_array():
    """Per-process row blocks assemble into the right global sharded array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from demuxalot_tpu.parallel.mesh import make_mesh, put_row_shards

    mesh = make_mesh()
    n = mesh.devices.size
    shd = NamedSharding(mesh, PartitionSpec("barcodes"))
    blocks = {k: np.full((3, 4), k, dtype=np.float32) for k in range(n)}
    out = put_row_shards({k: b for k, b in blocks.items()}, shd, (3 * n, 4))
    expected = np.concatenate([blocks[k] for k in range(n)])
    np.testing.assert_array_equal(np.asarray(out), expected)

    # flat 1-D layout
    flat_blocks = {k: np.arange(5, dtype=np.int32) + 10 * k for k in range(n)}
    out1 = put_row_shards(flat_blocks, shd, (5 * n,))
    np.testing.assert_array_equal(
        np.asarray(out1), np.concatenate([flat_blocks[k] for k in range(n)])
    )


def test_shard_subset_layouts_match_full():
    """Building only a subset of shards yields the same rows as the full build."""
    from demuxalot_tpu.ops import packing as P
    from demuxalot_tpu.ops.tiling import tile_barcode_calls_sharded

    rng = np.random.RandomState(3)
    n_calls, n_barcodes, n_shards = 5000, 256, 4
    cb = np.sort(rng.randint(0, n_barcodes, n_calls)).astype(np.int32)
    vid = rng.randint(0, 500, n_calls).astype(np.int32)
    q = rng.uniform(1e-4, 0.5, n_calls).astype(np.float32)

    full = tile_barcode_calls_sharded(cb, vid, q, n_barcodes, n_shards=n_shards)
    subset = tile_barcode_calls_sharded(
        cb, vid, q, n_barcodes, n_shards=n_shards,
        shard_ids=[1, 3], n_chunks_floor=full.n_chunks,
    )
    assert subset.n_chunks == full.n_chunks
    np.testing.assert_array_equal(subset.vid[0], full.vid[1])
    np.testing.assert_array_equal(subset.vid[1], full.vid[3])
    np.testing.assert_array_equal(subset.q[1], full.q[3])
    np.testing.assert_array_equal(subset.chunk_bounds[0], full.chunk_bounds[1])

    rec = np.recarray(n_calls, dtype=P.BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    dev_full = P.device_pack_barcode_calls(rec, n_barcodes, n_shards=n_shards, pad_multiple=8)
    dev_sub = P.device_pack_barcode_calls(
        rec, n_barcodes, n_shards=n_shards, pad_multiple=8,
        shard_ids=[2], per_shard_calls_floor=dev_full.per_shard_calls,
    )
    w = dev_full.per_shard_calls
    np.testing.assert_array_equal(dev_sub.vid_b, dev_full.vid_b[2 * w : 3 * w])
    np.testing.assert_array_equal(dev_sub.q_v, dev_full.q_v[2 * w : 3 * w])


def test_dot_words_split_accuracy():
    """Two-word bf16 split against an exact operand is ~f32-accurate."""
    import jax.numpy as jnp

    from demuxalot_tpu.ops.pallas_likelihood import dot_words

    rng = np.random.RandomState(0)
    exact = rng.choice([0.0, 0.5, 1.0], size=(48, 16)).astype(np.float32)
    dense = rng.uniform(1e-4, 1.0, size=(16, 256)).astype(np.float32)
    want = exact.astype(np.float64) @ dense.astype(np.float64)
    got = np.asarray(dot_words(jnp.asarray(exact), jnp.asarray(dense), ((1,), (0,)), 2))
    assert np.max(np.abs(got - want) / (1e-9 + np.abs(want))) < 1e-5

    # split side may also be the left operand
    got_a = np.asarray(
        dot_words(jnp.asarray(dense.T), jnp.asarray(exact.T), ((1,), (0,)), 2, split="a")
    )
    np.testing.assert_allclose(got_a, want.T, rtol=1e-5, atol=1e-6)


def test_bf16_words_reconstruction():
    """The shared word-split helper keeps the posterior-safe precision contract.

    Every in-kernel matmul strategy (dot_words, dot_words_stacked, the
    stack_scatter branch) now routes through bf16_words; this pins its
    invariants: each word is exactly representable in bf16, and the word sum
    restores ~16 mantissa bits of the input.
    """
    import jax.numpy as jnp

    from demuxalot_tpu.ops.pallas_likelihood import bf16_words

    rng = np.random.RandomState(7)
    x_np = rng.uniform(-8.0, 8.0, size=(64, 96)).astype(np.float32)
    x = jnp.asarray(x_np)

    words = bf16_words(x, 2)
    assert len(words) == 2
    for w in words:  # bf16-exactness: re-rounding must be the identity
        w_np = np.asarray(w)
        np.testing.assert_array_equal(
            w_np, np.asarray(jnp.asarray(w_np).astype(jnp.bfloat16).astype(jnp.float32))
        )
    recon = np.asarray(words[0] + words[1])
    rel = np.abs(recon - x_np) / np.maximum(np.abs(x_np), 1e-6)
    assert rel.max() < 2**-15  # two 8-bit-mantissa words ≈ 16 mantissa bits

    # one word degenerates to plain bf16 rounding (the "default" strategy)
    (single,) = bf16_words(x, 1)
    np.testing.assert_array_equal(
        np.asarray(single), np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
    )


def test_sharded_banded_estep_matches_plain():
    """Variant-banded sharded E-step == plain sharded E-step (virtual mesh)."""
    import jax
    import jax.numpy as jnp

    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import build_mixing_sl, padded_pg
    from demuxalot_tpu.ops.tiling import tile_barcode_calls_sharded
    from demuxalot_tpu.parallel.mesh import make_mesh
    from demuxalot_tpu.parallel.sharded import _build_estep_pallas
    from demuxalot_tpu.sim import synthesize_device_workload

    mesh = make_mesh()
    S = mesh.devices.size
    n_barcodes, n_donors, n_snps, cpb = 64 * S, 5, 128, 12
    betas, v2s, vid, cb, q, _ = synthesize_device_workload(n_barcodes, n_donors, n_snps, cpb, seed=4)
    n_variants = betas.shape[0]
    mixing, _names = L.pseudogenotype_mixing([f"D{i}" for i in range(n_donors)], 0.3)
    pen = L.doublet_penalties(n_donors, 0.3)
    pg = mixing.shape[1]
    pgp = padded_pg(pg)
    gp_args = (jnp.asarray(betas), jnp.asarray(v2s))

    order = np.argsort(cb, kind="stable")
    results = []
    for n_bands in (1, 3):
        st = tile_barcode_calls_sharded(
            cb[order], vid[order], q[order], n_barcodes, n_shards=S,
            tile_barcodes=16, chunk_calls=128, pgp=pgp,
            n_variants=n_variants, n_bands=n_bands,
        )
        estep = jax.jit(_build_estep_pallas(mesh, n_snps, 0.01, st, pg))
        shd = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("barcodes"))
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        put_s = lambda x: jax.device_put(x, shd)
        put_r = lambda x: jax.device_put(np.asarray(x), rep)
        pen_p = np.zeros((1, pgp), np.float32)
        pen_p[0, :pg] = pen
        logits, _probs = estep(
            put_r(betas), put_r(np.float32(0.0)), put_r(v2s),
            put_r(build_mixing_sl(mixing)), put_r(pen_p),
            put_s(st.vid), put_s(st.seg_group), put_s(st.q),
            put_s(st.chunk_bounds), put_s(st.chunk_suboff),
        )
        results.append(np.asarray(logits)[:n_barcodes])

    np.testing.assert_allclose(results[1], results[0], rtol=1e-5, atol=1e-5)


def test_sharded_accepts_packed_calls(small_problem):
    """The sharded engine unwraps a PackedCalls dataset (pack-level reuse)."""
    from demuxalot_tpu import PackedCalls

    genotypes, barcode_handler, calls = small_problem
    packed = PackedCalls(calls, genotypes)
    sharded = ShardedDemultiplexer(make_mesh())
    logits_dict, probs_dict = sharded.predict_posteriors(
        calls, genotypes, barcode_handler, doublet_prior=0.35
    )
    logits_packed, probs_packed = sharded.predict_posteriors(
        packed, genotypes, barcode_handler, doublet_prior=0.35
    )
    np.testing.assert_array_equal(logits_dict.values, logits_packed.values)
    np.testing.assert_array_equal(probs_dict.values, probs_packed.values)

    learnt_d, probs_d = sharded.learn_genotypes(
        calls, genotypes, barcode_handler, n_iterations=2
    )
    learnt_p, probs_p = sharded.learn_genotypes(
        packed, genotypes, barcode_handler, n_iterations=2
    )
    np.testing.assert_array_equal(probs_d.values, probs_p.values)
    np.testing.assert_array_equal(learnt_d.get_betas(), learnt_p.get_betas())


def test_sharded_layout_cache_zero_retile(small_problem):
    """Predict-after-learn on one PackedCalls re-tiles nothing (VERDICT r4 #4).

    The shard layouts cache on the dataset; the E-step tiling is sized at
    the donor count's max pseudo-genotype width so learn(doublet_prior=0)
    and predict(0.35) share one entry, and results stay identical to the
    per-call path.
    """
    from demuxalot_tpu import PackedCalls

    genotypes, barcode_handler, calls = small_problem
    packed = PackedCalls(calls, genotypes)
    sharded = ShardedDemultiplexer(make_mesh())

    learnt, probs_em = sharded.learn_genotypes(
        packed, genotypes, barcode_handler, n_iterations=2
    )
    misses_after_learn = sharded.layout_cache_misses
    assert misses_after_learn >= 1

    logits, probs = sharded.predict_posteriors(
        packed, genotypes, barcode_handler, doublet_prior=0.35
    )
    # the predict entry point reused the learn-built E-step layout: zero
    # new tilings, one cache hit
    assert sharded.layout_cache_misses == misses_after_learn
    assert sharded.layout_cache_hits >= 1

    # a second learn re-tiles nothing either (E-step AND M-step entries hit)
    hits_before = sharded.layout_cache_hits
    sharded.learn_genotypes(packed, genotypes, barcode_handler, n_iterations=2)
    assert sharded.layout_cache_misses == misses_after_learn
    assert sharded.layout_cache_hits >= hits_before + 2

    # results identical to the per-call-dict flow on a fresh engine
    fresh = ShardedDemultiplexer(make_mesh())
    logits_d, probs_d = fresh.predict_posteriors(
        calls, genotypes, barcode_handler, doublet_prior=0.35
    )
    np.testing.assert_array_equal(logits.values, logits_d.values)


def test_sharded_stage_timings_hook(small_problem):
    """STAGE_TIMINGS instrumentation covers the sharded entry points too."""
    from demuxalot_tpu.models import demux as demux_mod

    genotypes, barcode_handler, calls = small_problem
    sharded = ShardedDemultiplexer(make_mesh())
    demux_mod.STAGE_TIMINGS = {}
    try:
        _lg, probs_t = sharded.predict_posteriors(
            calls, genotypes, barcode_handler, doublet_prior=0.35
        )
        predict_detail = demux_mod.STAGE_TIMINGS
        demux_mod.STAGE_TIMINGS = {}
        _learnt, probs_em = sharded.learn_genotypes(
            calls, genotypes, barcode_handler, n_iterations=2
        )
        learn_detail = demux_mod.STAGE_TIMINGS
        demux_mod.STAGE_TIMINGS = None
        for key in ("pack_s", "layout_s", "upload_flush_s", "forward_s",
                    "materialize_s", "h2d_bytes", "d2h_logits_bytes"):
            assert key in predict_detail, (key, predict_detail)
        for key in ("pack_s", "layout_s", "upload_flush_s", "device_loop_s",
                    "materialize_s", "h2d_bytes", "d2h_addition_bytes"):
            assert key in learn_detail, (key, learn_detail)

        # instrumentation must not change results
        demux_mod.STAGE_TIMINGS = None
        _lg2, probs_u = sharded.predict_posteriors(
            calls, genotypes, barcode_handler, doublet_prior=0.35
        )
        np.testing.assert_array_equal(probs_t.values, probs_u.values)
    finally:
        demux_mod.STAGE_TIMINGS = None


def test_sharded_compact_matches_full(small_problem):
    """Sharded compact output == full sharded frames (same contract)."""
    genotypes, barcode_handler, calls = small_problem
    from demuxalot_tpu import PackedCalls

    packed = PackedCalls(calls, genotypes)
    sharded = ShardedDemultiplexer(make_mesh())
    logits_df, probs_df = sharded.predict_posteriors(
        packed, genotypes, barcode_handler, doublet_prior=0.35
    )
    compact = sharded.predict_posteriors_compact(
        packed, genotypes, barcode_handler, doublet_prior=0.35, k=3
    )
    full = logits_df.values
    np.testing.assert_array_equal(compact.assignment, full.argmax(axis=1))
    rows = np.arange(full.shape[0])[:, None]
    np.testing.assert_array_equal(
        compact.top_logits, full[rows, compact.top_index]
    )
    top1 = probs_df.values[rows[:, 0], compact.assignment]
    np.testing.assert_allclose(compact.top_probs[:, 0], top1, atol=1e-5)
    assert compact.bytes_moved < full.nbytes
    assert list(compact.to_dataframe().index) == list(logits_df.index)

    # bf16 frame on request, within 1 bf16 ulp of the full f32 frame
    compact_bf = sharded.predict_posteriors_compact(
        packed, genotypes, barcode_handler, doublet_prior=0.35, k=3,
        include_logits=True,
    )
    bf = compact_bf.logits_bf16.astype(np.float32)
    ulp = np.maximum(np.abs(full) * 2.0**-7, np.finfo(np.float32).tiny)
    assert (np.abs(bf - full) <= ulp).all()
    assert compact_bf.logits_dataframe().shape == logits_df.shape


def test_sharded_auto_damping_packs_once(small_problem):
    """damping='auto' shares one pack + shard layouts between its two runs."""
    genotypes, barcode_handler, calls = small_problem
    sharded = ShardedDemultiplexer(make_mesh())
    learnt, probs = sharded.learn_genotypes(
        calls, genotypes, barcode_handler, n_iterations=2, damping="auto"
    )
    assert probs.attrs["damping_selected"] in (None, "anchor")
    # two EM runs, but the second hits the cache built by the first:
    # exactly one estep + one mstep layout build in total
    assert sharded.layout_cache_misses == 2, (
        sharded.layout_cache_misses, sharded.layout_cache_hits)
    assert sharded.layout_cache_hits >= 2
