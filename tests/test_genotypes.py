"""ProbabilisticGenotypes importers: VCF rules, assignments, bead arrays."""
import numpy as np
import pandas as pd
import pytest

from demuxalot_tpu import ProbabilisticGenotypes


def _write_vcf(path, lines):
    header = [
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tD1\tD2\tD3",
    ]
    path.write_text("\n".join(header + lines) + "\n")


def test_add_vcf_rules(tmp_path):
    vcf = tmp_path / "g.vcf"
    _write_vcf(vcf, [
        # normal SNV: contribution split over diploid calls
        "chr1\t10\ts0\tA\tC\t.\t.\t.\tGT\t0/0\t0/1\t1/1",
        # donor D3 missing -> 0.1 * mean of provided
        "chr1\t20\ts1\tG\tT\t.\t.\t.\tGT\t0/0\t1/1\t./.",
        # only one donor has it -> skipped entirely
        "chr1\t30\ts2\tA\tG\t.\t.\t.\tGT\t0/0\t./.\t./.",
        # non-SNV (indel) -> skipped
        "chr1\t40\ts3\tAT\tA\t.\t.\t.\tGT\t0/0\t0/1\t1/1",
        # non-ACGT allele -> skipped
        "chr1\t50\ts4\tA\tN\t.\t.\t.\tGT\t0/0\t0/1\t1/1",
    ])
    g = ProbabilisticGenotypes(["D1", "D2", "D3"])
    g.add_vcf(str(vcf), prior_strength=100.0)

    # positions are zero-based internally
    assert ("chr1", 9, "A") in g.var2varid and ("chr1", 9, "C") in g.var2varid
    ref_row = g.variant_betas[g.var2varid[("chr1", 9, "A")]]
    alt_row = g.variant_betas[g.var2varid[("chr1", 9, "C")]]
    np.testing.assert_allclose(ref_row, [100, 50, 0])
    np.testing.assert_allclose(alt_row, [0, 50, 100])

    # missing donor gets 0.1 * mean of the provided donors
    ref2 = g.variant_betas[g.var2varid[("chr1", 19, "G")]]
    alt2 = g.variant_betas[g.var2varid[("chr1", 19, "T")]]
    np.testing.assert_allclose(ref2, [100, 0, 0.1 * 50])
    np.testing.assert_allclose(alt2, [0, 100, 0.1 * 50])

    # the <2-donor record is skipped AFTER id creation (matching the
    # reference): its variants exist but carry zero weight
    assert ("chr1", 29, "A") in g.var2varid
    np.testing.assert_allclose(g.variant_betas[g.var2varid[("chr1", 29, "A")]], 0)
    # non-SNV / non-ACGT records are rejected before id creation
    assert all(pos != 39 for _c, pos, _b in g.var2varid)
    assert all(pos != 49 for _c, pos, _b in g.var2varid)


def test_add_assignment_dataframe():
    g = ProbabilisticGenotypes(["D1", "D2", "D3"])
    index = pd.MultiIndex.from_tuples(
        [("chr1", 5, "A", "G"), ("chr1", 9, "C", "T")],
        names=["CHROM", "POS1BASED", "REF", "ALT"],
    )
    assignment = pd.DataFrame(
        {"D1": ["0/0", "0/1"], "D2": ["1/1", None], "D3": ["./.", "1/1"]}, index=index
    )
    g.add_assignment_dataframe(assignment, prior_strength=10.0)

    np.testing.assert_allclose(g.variant_betas[g.var2varid[("chr1", 4, "A")]], [10, 0, 0])
    np.testing.assert_allclose(g.variant_betas[g.var2varid[("chr1", 4, "G")]], [0, 10, 0])
    np.testing.assert_allclose(g.variant_betas[g.var2varid[("chr1", 8, "C")]], [5, 0, 0])
    np.testing.assert_allclose(g.variant_betas[g.var2varid[("chr1", 8, "T")]], [5, 0, 10])


def test_add_raw_values_from_bead_array():
    g = ProbabilisticGenotypes(["D1", "D2"])
    index = pd.MultiIndex.from_tuples(
        [("chr1", 3, "A", "C"), ("chr2", 7, "G", "T")],
        names=["chromosome", "position1based", "alleleA", "alleleB"],
    )
    logrratio = pd.DataFrame({"D1": [0.0, -1.0], "D2": [np.nan, 0.0]}, index=index)
    b_allele_freq = pd.DataFrame({"D1": [0.0, 1.0], "D2": [0.5, 0.25]}, index=index)
    g.add_raw_values_from_bead_array(logrratio, b_allele_freq, prior_strength=100.0)

    a1 = g.variant_betas[g.var2varid[("chr1", 2, "A")]]
    b1 = g.variant_betas[g.var2varid[("chr1", 2, "C")]]
    # D1: logr 0 -> contribution 100, freq 0 -> all to allele A
    assert np.isclose(a1[0], 100) and np.isclose(b1[0], 0)
    # D2: undefined -> logr -20 -> contribution 100*2^-20 split 0 freq
    assert np.isclose(a1[1], 100 * 2**-20) and np.isclose(b1[1], 0)

    a2 = g.variant_betas[g.var2varid[("chr2", 6, "G")]]
    b2 = g.variant_betas[g.var2varid[("chr2", 6, "T")]]
    # D1: logr -1 -> 50, freq 1 -> all to allele B
    assert np.isclose(a2[0], 0) and np.isclose(b2[0], 50)
    # D2: logr 0 -> 100, freq 0.25
    assert np.isclose(a2[1], 75) and np.isclose(b2[1], 25)


def test_import_unknown_genotypes_warns_and_filters(tmp_path):
    vcf = tmp_path / "g.vcf"
    header = [
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tD1\tDX",
        "chr1\t10\ts0\tA\tC\t.\t.\t.\tGT\t0/0\t1/1",
    ]
    vcf.write_text("\n".join(header) + "\n")
    g = ProbabilisticGenotypes(["D1", "D2"])
    with pytest.warns(UserWarning):
        g.add_vcf(str(vcf))
    # DX ignored; only D1 carries the SNP so the contribution is skipped
    # (ids are created first, matching the reference) -> zero-weight variants
    assert g.n_variants == 2
    np.testing.assert_allclose(g.variant_betas[: g.n_variants], 0)

    g2 = ProbabilisticGenotypes(["D1"])
    with pytest.raises(RuntimeError):
        g2._check_imported_genotypes(["DX", "DY"])


def test_extend_variants_doubles_capacity():
    g = ProbabilisticGenotypes(["D1", "D2"])
    initial_capacity = len(g.variant_betas)
    for i in range(initial_capacity + 5):
        g.get_variant_id("chr1", i, "A")
    assert g.n_variants == initial_capacity + 5
    assert len(g.variant_betas) >= g.n_variants
