"""The `python -m demuxalot_tpu` CLI drives the pipeline end to end."""
import numpy as np
import pandas as pd
import pytest

from demuxalot_tpu.cli import main
from demuxalot_tpu.sim import generate_bam_file


@pytest.fixture(scope="module")
def cli_problem(tmp_path_factory):
    np.random.seed(11)
    root = tmp_path_factory.mktemp("cli")
    bam = str(root / "sample.bam")
    bam, genotypes, _ids, names = generate_bam_file(
        bam, n_genotypes=3, doublets_fraction=0.1, mutation_prob=0.03,
        n_barcodes=200, n_reads_per_barcode=60,
        chromosome2length={"chr1": 600, "chr2": 600},
    )
    barcodes = root / "barcodes.csv"
    barcodes.write_text("\n".join(names) + "\n")
    betas = root / "prior_betas.parquet"
    genotypes.save_betas(str(betas))
    return bam, str(barcodes), str(betas), genotypes


def test_cli_demux_refine(cli_problem, tmp_path):
    bam, barcodes, betas, genotypes = cli_problem
    out = tmp_path / "out"
    cache = tmp_path / "cache"
    rc = main([
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas,  # donor names discovered from the parquet
        "--output-dir", str(out), "--counts-cache", str(cache),
        "--n-iterations", "2", "--doublet-prior", "0.25", "--jobs", "2",
    ])
    assert rc == 0
    probs = pd.read_csv(out / "posteriors.csv", index_col=0)
    n_donors = len(genotypes.genotype_names)
    assert probs.shape[1] == n_donors + n_donors * (n_donors - 1) // 2
    sums = probs.sum(axis=1).to_numpy()
    np.testing.assert_allclose(sums[np.isfinite(sums)], 1.0, atol=1e-4)

    assignments = pd.read_csv(out / "assignments.csv", index_col=0)
    assert set(assignments.columns) == {"assignment", "posterior"}
    # with the true betas as prior, most barcodes should be confidently called
    assert (assignments["posterior"] > 0.9).mean() > 0.5

    learnt = pd.read_parquet(out / "learnt_betas.parquet")
    assert list(learnt.columns) == genotypes.genotype_names
    assert list(cache.glob("*.calls.npz")), "counts cache must be written"

    # second run must reuse the cache and support posterior-only inference
    out2 = tmp_path / "out2"
    rc = main([
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--no-refine",
        "--output-dir", str(out2), "--counts-cache", str(cache),
    ])
    assert rc == 0
    assert (out2 / "logits.csv").exists()
    probs2 = pd.read_csv(out2 / "posteriors.csv", index_col=0)
    assert probs2.shape == probs.shape


def test_cli_count_writes_reusable_counts(cli_problem, tmp_path):
    from demuxalot_tpu.frontend.snp_counter import load_snp_counts

    bam, barcodes, betas, _genotypes = cli_problem
    counts_dir = tmp_path / "counts"
    rc = main([
        "count", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--counts-dir", str(counts_dir), "--jobs", "2",
    ])
    assert rc == 0
    counts = load_snp_counts(counts_dir)
    assert set(counts) == {"chr1", "chr2"}
    assert all(c.n_molecules > 0 for c in counts.values())


def test_cli_counts_cache_rejects_changed_inputs(cli_problem, tmp_path):
    """A cache scanned under one whitelist must not be reused under another."""
    bam, barcodes, betas, _genotypes = cli_problem
    cache = tmp_path / "cache"
    base = ["--bam", bam, "--prior-betas", betas, "--no-refine",
            "--counts-cache", str(cache)]
    rc = main(["demux", "--barcodes", barcodes,
               "--output-dir", str(tmp_path / "out1"), *base])
    assert rc == 0
    assert (cache / "manifest.json").exists()

    # drop one barcode: every compressed_cb slot after it would shift
    shorter = tmp_path / "shorter.csv"
    shorter.write_text("".join(open(barcodes).readlines()[:-1]))
    with pytest.raises(SystemExit, match="different inputs"):
        main(["demux", "--barcodes", str(shorter),
              "--output-dir", str(tmp_path / "out2"), *base])

    # a manifest-less (partial/pre-manifest) cache triggers a re-scan, not reuse
    (cache / "manifest.json").unlink()
    rc = main(["demux", "--barcodes", barcodes,
               "--output-dir", str(tmp_path / "out3"), *base])
    assert rc == 0
    assert (cache / "manifest.json").exists()


def test_cli_rejects_partial_rg_column(cli_problem, tmp_path):
    bam, _barcodes, betas, _genotypes = cli_problem
    ragged = tmp_path / "ragged.csv"
    ragged.write_text("BC0-1,fileA\nBC1-1,\n")  # trailing comma -> NaN RG
    with pytest.raises(SystemExit, match="empty entries"):
        main(["count", "--bam", bam, "--barcodes", str(ragged),
              "--prior-betas", betas, "--counts-dir", str(tmp_path / "c")])


def test_parse_bam_forms(tmp_path):
    from demuxalot_tpu.cli import _parse_bam

    plain = tmp_path / "sample.bam"
    plain.touch()
    weird = tmp_path / "run=2.bam"  # '=' inside a real path
    weird.touch()

    assert _parse_bam([str(plain)]) == str(plain)
    assert _parse_bam([str(weird)]) == str(weird)
    assert _parse_bam([f"L1={plain}"]) == {"L1": str(plain)}
    # unresolvable lone value stays a plain path (missing-file error later
    # names the actual path instead of a half-split mapping)
    assert _parse_bam(["L1=missing.bam"]) == "L1=missing.bam"
    assert _parse_bam([f"A={plain}", f"B={weird}"]) == {
        "A": str(plain), "B": str(weird)}


def test_cli_requires_some_genotype_source(cli_problem):
    bam, barcodes, _betas, _genotypes = cli_problem
    with pytest.raises(SystemExit):
        main(["demux", "--bam", bam, "--barcodes", barcodes,
              "--output-dir", "/tmp/never"])


def test_cli_sharded_matches_single_device(cli_problem, tmp_path):
    """--sharded (virtual 8-device mesh here) reproduces the plain posteriors."""
    bam, barcodes, betas, _genotypes = cli_problem
    cache = tmp_path / "cache"
    outs = {}
    for label, extra in (("plain", []), ("sharded", ["--sharded"])):
        out = tmp_path / label
        rc = main([
            "demux", "--bam", bam, "--barcodes", barcodes,
            "--prior-betas", betas, "--no-refine",
            "--output-dir", str(out), "--counts-cache", str(cache), *extra,
        ])
        assert rc == 0
        outs[label] = pd.read_csv(out / "posteriors.csv", index_col=0)
    pd.testing.assert_frame_equal(outs["plain"], outs["sharded"], atol=1e-5)


def test_cli_multibam_rg_count(tmp_path):
    """RG=PATH --bam form + two-column barcode csv keep (barcode, RG) identity."""
    from demuxalot_tpu.bamio import AlignedRead, BamWriter, index_bam, sort_bam
    from demuxalot_tpu.frontend.snp_counter import load_snp_counts
    from demuxalot_tpu.models.genotypes import ProbabilisticGenotypes

    def read(start, seq, i):
        a = AlignedRead()
        a.query_name = f"r{i}"
        a.flag = 0
        a.reference_id = 0
        a.reference_start = start
        a.mapping_quality = 60
        a.query_sequence = seq
        a.cigar = ((0, len(seq)),)
        a.query_qualities = [30] * len(seq)
        a.tags = (("NH", 1), ("AS", len(seq) - 2), ("CB", "SHARED-1"),
                  ("UB", f"UMI{i:05}A43"))
        return a

    def write_bam(path, base):
        header = {"SQ": [{"SN": "chr1", "LN": 1000}]}
        with BamWriter(path, header) as writer:
            for i in range(30):
                writer.write(read(i, base * 50, i))
        sort_bam(path, path)
        index_bam(path)

    bam_a, bam_b = str(tmp_path / "a.bam"), str(tmp_path / "b.bam")
    write_bam(bam_a, "A")
    write_bam(bam_b, "C")

    # same barcode string in both files; the second csv column disambiguates
    barcodes = tmp_path / "barcodes.csv"
    barcodes.write_text("SHARED-1,fileA\nSHARED-1,fileB\n")

    store = ProbabilisticGenotypes(genotype_names=["D1", "D2"])
    for pos, base, betas in ((10, "A", (10.0, 0.5)), (10, "C", (0.5, 10.0)),
                             (20, "A", (10.0, 0.5)), (20, "C", (0.5, 10.0))):
        row = store.get_variant_id("chr1", pos, base)
        store.variant_betas[row] = betas
    betas_path = tmp_path / "betas.parquet"
    store.save_betas(str(betas_path))

    counts_dir = tmp_path / "counts"
    rc = main([
        "count", "--bam", f"fileA={bam_a}", "--bam", f"fileB={bam_b}",
        "--barcodes", str(barcodes), "--prior-betas", str(betas_path),
        "--counts-dir", str(counts_dir), "--jobs", "2",
    ])
    assert rc == 0
    counts = load_snp_counts(counts_dir)
    chr1 = counts["chr1"]
    cbs = set(chr1.molecules["compressed_cb"][chr1.snp_calls["molecule_index"]])
    assert cbs == {0, 1}, "both (barcode, RG) identities must appear"


def test_cli_rejects_malformed_multibam(cli_problem):
    bam, barcodes, betas, _genotypes = cli_problem
    with pytest.raises(SystemExit, match="RG=PATH"):
        main(["count", "--bam", bam, "--bam", "second.bam",
              "--barcodes", barcodes, "--prior-betas", betas,
              "--counts-dir", "/tmp/never"])


def test_cli_detect_snps_smoke(cli_problem, tmp_path):
    """detect-snps plumbing: runs, writes the positions parquet schema."""
    import pandas as pd

    bam, barcodes, betas, _genotypes = cli_problem
    out = tmp_path / "discovered.parquet"
    rc = main([
        "detect-snps", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--min-coverage", "30",
        "--min-alternative-coverage", "5", "--out", str(out), "--jobs", "2",
    ])
    assert rc == 0
    frame = pd.read_parquet(out)
    assert list(frame.index.names) == ["CHROM", "POS", "BASE"]


def test_cli_donor_subset(cli_problem, tmp_path):
    bam, barcodes, betas, genotypes = cli_problem
    subset = genotypes.genotype_names[:2]
    out = tmp_path / "subset_out"
    rc = main([
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--donors", ",".join(subset),
        "--no-refine", "--output-dir", str(out),
        "--counts-cache", str(tmp_path / "subset_cache"),
    ])
    assert rc == 0
    probs = pd.read_csv(out / "posteriors.csv", index_col=0)
    assert probs.shape[1] == 2 + 1  # two donors + one doublet pair


def test_cli_demux_compact(cli_problem, tmp_path):
    """--compact writes the top-k assignment table and skips the full frames."""
    bam, barcodes, betas, genotypes = cli_problem
    out_full = tmp_path / "full"
    out_c = tmp_path / "compact"
    cache = tmp_path / "cache"
    common = [
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--no-refine",
        "--counts-cache", str(cache), "--doublet-prior", "0.25",
    ]
    assert main([*common, "--output-dir", str(out_full)]) == 0
    assert main([*common, "--output-dir", str(out_c), "--compact"]) == 0

    assert not (out_c / "posteriors.csv").exists()
    assignments = pd.read_csv(out_c / "assignments.csv", index_col=0)
    assert list(assignments.columns) == [
        "assignment", "runner_up", "logit_margin", "posterior"
    ]
    # bit-identical assignments vs the full-frame argmax path
    logits = pd.read_csv(out_full / "logits.csv", index_col=0)
    expected = logits.columns[logits.values.argmax(axis=1)]
    assert (assignments["assignment"].values == expected.values).all()
    probs = pd.read_csv(out_full / "posteriors.csv", index_col=0)
    np.testing.assert_allclose(
        assignments["posterior"].values, probs.values.max(axis=1), atol=1e-5
    )

    # refine + compact: learn, then compact predict on the learnt clone
    out_r = tmp_path / "refined_compact"
    rc = main([
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--compact",
        "--output-dir", str(out_r), "--counts-cache", str(cache),
        "--n-iterations", "2", "--doublet-prior", "0.25",
    ])
    assert rc == 0
    assert (out_r / "learnt_betas.parquet").exists()
    a2 = pd.read_csv(out_r / "assignments.csv", index_col=0)
    assert (a2["logit_margin"] >= 0).all()

    # sharded engine accepts --compact too
    out_s = tmp_path / "sharded_compact"
    rc = main([
        "demux", "--bam", bam, "--barcodes", barcodes,
        "--prior-betas", betas, "--no-refine", "--compact", "--sharded",
        "--output-dir", str(out_s), "--counts-cache", str(cache),
        "--doublet-prior", "0.25",
    ])
    assert rc == 0
    a3 = pd.read_csv(out_s / "assignments.csv", index_col=0)
    assert (a3["assignment"].values == assignments["assignment"].values).all()
