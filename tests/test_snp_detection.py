"""SNP discovery: hidden discriminative positions must be recovered."""
import numpy as np
import pytest

from demuxalot_tpu import (
    BarcodeHandler,
    ProbabilisticGenotypes,
    detect_snps_positions,
)
from demuxalot_tpu.sim import generate_bam_file


@pytest.fixture(scope="module")
def detection_problem(tmp_path_factory):
    np.random.seed(5)
    filename = str(tmp_path_factory.mktemp("bam") / "d.bam")
    filename, genotypes, _ids, names = generate_bam_file(
        filename, n_genotypes=4, doublets_fraction=0.1, mutation_prob=0.03,
        n_barcodes=300, n_reads_per_barcode=80,
        chromosome2length={"chr1": 800, "chr2": 800},
    )
    return filename, genotypes, BarcodeHandler(list(names))


def test_detects_hidden_snps(detection_problem, tmp_path):
    filename, genotypes, bh = detection_problem

    # keep only chr1 in the known genotypes; chr2's SNPs must be discovered
    known = ProbabilisticGenotypes(genotypes.genotype_names)
    for (chrom, pos, base), vid in genotypes.var2varid.items():
        if chrom == "chr1":
            row = known.get_variant_id(chrom, pos, base)
            known.variant_betas[row] = genotypes.variant_betas[vid]

    out_parquet = str(tmp_path / "discovered.parquet")
    selected = detect_snps_positions(
        filename,
        genotypes=known,
        barcode_handler=bh,
        minimum_coverage=50,
        minimum_alternative_coverage=10,
        minimum_alternative_fraction=0.01,
        joblib_n_jobs=2,
        joblib_verbosity=0,
        result_beta_prior_filename=out_parquet,
    )
    assert len(selected) > 0
    chroms = {chrom for chrom, _pos, _imp, _bases in selected}
    assert "chr2" in chroms, "should discover positions on the unknown chromosome"

    # known positions are excluded by default
    known_positions = known.get_snp_positions_set()
    for chrom, pos, _imp, _bases in selected:
        assert (chrom, pos) not in known_positions

    # exported parquet feeds back into genotypes as zero-weight variants
    n_before = known.n_variants
    enriched = known.clone()
    enriched.add_prior_betas(out_parquet, prior_strength=10)
    assert enriched.n_variants > n_before

    # discovered positions overlap the truly discriminative chr2 positions
    true_chr2 = {pos for (chrom, pos, _b) in genotypes.var2varid if chrom == "chr2"}
    discovered_chr2 = {pos for chrom, pos, *_ in selected if chrom == "chr2"}
    overlap = len(discovered_chr2 & true_chr2) / max(1, len(discovered_chr2))
    print(f"discovered {len(discovered_chr2)} chr2 positions, {overlap:.0%} truly polymorphic")
    assert overlap > 0.5


def test_donor_base_tables_ignore_n_calls():
    """'N' calls (base code 4) must neither crash nor leak into the tables.

    The reference scatter-adds base_index into a 4-wide table, so an 'N'
    either raises or aliases a neighboring position's base-0 count
    (demuxalot/snp_detection.py:117-124); we drop them explicitly.
    """
    from demuxalot_tpu.frontend.snp_counter import CompressedSNPCalls
    from demuxalot_tpu.models.snp_detection import _donor_base_tables

    calls = CompressedSNPCalls()
    calls.add_calls_from_read_group(0, 11, 0.01, [(5, "A", 1e-4), (7, "N", 1e-4)])
    calls.add_calls_from_read_group(1, 12, 0.01, [(5, "C", 1e-4), (8, "N", 1e-4)])
    calls.minimize_memory_footprint()

    bh = BarcodeHandler(["BC0", "BC1"])
    tables = _donor_base_tables(
        calls, bh, {"BC0": "D1", "BC1": "D2"}, {"D1": 0, "D2": 1}
    )
    assert set(tables) == {5}, "N calls must not create or pollute positions"
    np.testing.assert_array_equal(tables[5], [[1, 0, 0, 0], [0, 1, 0, 0]])
