"""Reference-scale synthetic quality run (perf-marked).

The reference's synthetic harness runs 20 donors x 1000 barcodes x 100
reads at seed 42 (/root/reference/tests/test_synthetic.py:106-198); this
test reproduces that configuration end-to-end through this framework and
writes the measured losses to ``QUALITY.json`` at the repo root so every
round's numbers are a recorded artifact rather than prose.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from demuxalot_tpu import BarcodeHandler, Demultiplexer, count_snps
from demuxalot_tpu.sim import generate_bam_file

ARTIFACT = Path(__file__).resolve().parent.parent / "QUALITY.json"


def compute_loss(barcode2donor_names, barcode2probs):
    """Mean -log P(true donors), clipped (same metric as test_synthetic)."""
    probs = barcode2probs * 0
    for barcode, correct_donors in barcode2donor_names.items():
        for donor in correct_donors:
            probs.loc[barcode, donor] = barcode2probs.loc[barcode, donor]
    return -np.log(probs.sum(axis=1).clip(1e-4)).mean()


@pytest.mark.perf
def test_reference_scale_quality(tmp_path_factory):
    np.random.seed(42)
    filename = str(tmp_path_factory.mktemp("bam") / "ref_scale.bam")
    filename, genotypes, _ids, barcode2donor_names = generate_bam_file(
        filename,
        n_genotypes=20,
        doublets_fraction=0.2,
        mutation_prob=0.01,
        n_barcodes=1000,
        n_reads_per_barcode=100,
    )
    barcode_handler = BarcodeHandler(list(barcode2donor_names))
    calls = count_snps(
        filename,
        chromosome2positions=genotypes.get_chromosome2positions(),
        barcode_handler=barcode_handler,
        joblib_n_jobs=4,
        joblib_verbosity=0,
    )

    results = {}
    for noise_fraction in (0.0, 0.95, 1.0):
        degraded = genotypes.clone()
        snp_ids = degraded.get_snp_ids_for_variants()
        erased = np.random.random(snp_ids.max() + 1) < noise_fraction
        degraded.variant_betas[erased[snp_ids], :] = 0

        _lg, probs = Demultiplexer.predict_posteriors(
            calls, degraded, barcode_handler=barcode_handler, doublet_prior=0.0
        )
        loss_prior_only = compute_loss(barcode2donor_names, probs)
        _learnt, probs = Demultiplexer.learn_genotypes(
            calls, degraded, barcode_handler=barcode_handler, doublet_prior=0.0
        )
        loss_after_em = compute_loss(barcode2donor_names, probs)
        results[str(noise_fraction)] = {
            "loss_prior_only": round(float(loss_prior_only), 4),
            "loss_after_em": round(float(loss_after_em), 4),
        }
        print(f"noise={noise_fraction}: prior-only {loss_prior_only:.4f}, "
              f"after EM {loss_after_em:.4f}")

    ARTIFACT.write_text(json.dumps({
        "config": {"n_genotypes": 20, "n_barcodes": 1000, "n_reads_per_barcode": 100,
                   "doublets_fraction": 0.2, "mutation_prob": 0.01, "seed": 42},
        "losses_by_noise_fraction": results,
    }, indent=1) + "\n")

    # reference's acceptance bar (test_synthetic.py:196-198) + stronger checks
    assert results["1.0"]["loss_prior_only"] > results["0.0"]["loss_prior_only"]
    assert results["0.0"]["loss_prior_only"] < 0.5, "full genotypes must demultiplex confidently"
    # 5% surviving SNPs still demultiplex most barcodes correctly
    assert results["0.95"]["loss_prior_only"] < 2.0
    # NOTE: at 95% unsupervised degradation the EM refinement diverges after
    # its first iteration — measured as EXACTLY the reference's behavior:
    # running /root/reference/demuxalot/demux.py:68-118 on identical calls
    # gives per-iteration losses 1.0234, 0.9264, 2.1406, 2.8196, 3.3593,
    # 3.6647, matching ours to 4 decimals. With supervision the same EM
    # converges (test_synthetic.py::test_demultiplex_start_from_assignment),
    # and at 90% degradation with fewer donors it improves
    # (test_demultiplex_start_from_genotypes). We record, not hide, the
    # regime where unsupervised refinement fails.
