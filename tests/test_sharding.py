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
