"""Native C++ scanner vs the Python scanner: exact output parity."""
import functools
import os
import shutil

import numpy as np
import pytest

from demuxalot_tpu import BarcodeHandler
from demuxalot_tpu.frontend.snp_counter import count_snps
from demuxalot_tpu.sim import generate_bam_file

# DEMUX_NATIVE_REQUIRED=1 (set by CI) turns the no-toolchain skip into a hard
# failure so CI can never silently exercise the Python fallback.
gxx_available = shutil.which("g++") is not None or bool(os.environ.get("DEMUX_NATIVE_REQUIRED"))

if os.environ.get("DEMUX_NATIVE_REQUIRED"):
    from demuxalot_tpu.native import load_library

    load_library()  # raises at collection time if the scanner cannot build


def _assert_calls_equal(a, b):
    assert a.n_molecules == b.n_molecules
    assert a.n_snp_calls == b.n_snp_calls
    for field in ("compressed_cb", "compressed_ub"):
        np.testing.assert_array_equal(a.molecules[field], b.molecules[field])
    np.testing.assert_allclose(
        a.molecules["p_group_misaligned"], b.molecules["p_group_misaligned"], rtol=1e-6
    )
    for field in ("molecule_index", "snp_position", "base_index"):
        np.testing.assert_array_equal(a.snp_calls[field], b.snp_calls[field])
    np.testing.assert_allclose(a.snp_calls["p_base_wrong"], b.snp_calls["p_base_wrong"], rtol=1e-6)


@pytest.fixture(scope="module")
def bam_problem(tmp_path_factory):
    np.random.seed(21)
    filename = str(tmp_path_factory.mktemp("bam") / "n.bam")
    filename, genotypes, _ids, names = generate_bam_file(
        filename, n_genotypes=5, n_barcodes=150, n_reads_per_barcode=40,
        chromosome2length={"chr1": 900, "chr2": 700},
    )
    return filename, genotypes, BarcodeHandler(list(names))


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_native_matches_python_exactly(bam_problem):
    filename, genotypes, bh = bam_problem
    c2p = genotypes.get_chromosome2positions()
    python_calls = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0, native=False)
    native_calls = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0, native=True)
    assert set(python_calls) == set(native_calls)
    for chrom in python_calls:
        _assert_calls_equal(native_calls[chrom], python_calls[chrom])


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_native_multithreaded_matches(bam_problem):
    filename, genotypes, bh = bam_problem
    c2p = genotypes.get_chromosome2positions()
    one = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0, native=True)
    many = count_snps(filename, c2p, bh, joblib_n_jobs=4, joblib_verbosity=0, native=True)
    for chrom in one:
        _assert_calls_equal(one[chrom], many[chrom])


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_native_custom_umi_tag_via_partial(bam_problem):
    """functools.partial over the standard filter stays on the native path."""
    from demuxalot_tpu.frontend.cellranger import parse_read

    filename, genotypes, bh = bam_problem
    c2p = genotypes.get_chromosome2positions()
    custom = functools.partial(parse_read, umi_tag="UB", mapq_threshold=10)
    a = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0,
                   parse_read=custom, native=True)
    b = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0,
                   parse_read=custom, native=False)
    for chrom in a:
        _assert_calls_equal(a[chrom], b[chrom])


def test_partial_dispatch_resolution():
    """Threshold-tweaked standard filters must resolve to native parameters.

    Guards the dispatch decision itself (not the scan): a user's
    ``partial(cellranger.parse_read, mapq_threshold=30)`` — including
    nested partials — keeps the C++ path; positional partials and foreign
    callables return None (Python fallback).
    """
    from demuxalot_tpu.frontend import bd_rhapsody, cellranger
    from demuxalot_tpu.native.scanner import _extract_parse_params

    p = _extract_parse_params(functools.partial(cellranger.parse_read, mapq_threshold=30))
    assert p is not None and p["mapq_threshold"] == 30 and p["umi_tag"] == "UB"

    nested = functools.partial(
        functools.partial(cellranger.parse_read, mapq_threshold=30), score_diff_max=7
    )
    p = _extract_parse_params(nested)
    assert p is not None and p["mapq_threshold"] == 30 and p["score_diff_max"] == 7

    p = _extract_parse_params(bd_rhapsody.parse_read)
    assert p is not None and p["umi_tag"] == "MA"

    # positional args and unknown kwargs cannot be mapped onto the C++ signature
    assert _extract_parse_params(functools.partial(cellranger.parse_read, object())) is None
    assert _extract_parse_params(functools.partial(cellranger.parse_read, bogus=1)) is None
    assert _extract_parse_params(lambda read: None) is None


def test_custom_callable_falls_back(bam_problem):
    """An arbitrary parse_read callable must silently use the Python scanner."""
    from demuxalot_tpu.frontend.cellranger import parse_read

    filename, genotypes, bh = bam_problem
    c2p = genotypes.get_chromosome2positions()
    custom = lambda read: parse_read(read)
    calls = count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0,
                       parse_read=custom)
    assert sum(c.n_snp_calls for c in calls.values()) > 0
    with pytest.raises(RuntimeError):
        count_snps(filename, c2p, bh, joblib_n_jobs=None, joblib_verbosity=0,
                   parse_read=custom, native=True)


def test_rg_single_bam_falls_back_to_python(tmp_path):
    """Single merged BAM + RG-based identities must not use the C++ scanner."""
    from demuxalot_tpu.bamio import BamWriter, index_bam, sort_bam
    from demuxalot_tpu.bamio.bam import AlignedRead

    bam = str(tmp_path / "m.bam")
    with BamWriter(bam, {"HD": {"VN": "1.0"}, "SQ": [dict(LN=300, SN="chr1")]}) as w:
        for i in range(30):
            a = AlignedRead()
            a.query_name = f"r{i}"; a.flag = 0; a.reference_id = 0
            a.reference_start = i; a.mapping_quality = 60
            a.query_sequence = "A" * 50; a.cigar = ((0, 50),)
            a.query_qualities = [30] * 50
            a.tags = (("NH", 1), ("AS", 48), ("CB", "X-1"), ("UB", f"UMI{i:05}AA7"), ("RG", "L1"))
            w.write(a)
    sort_bam(bam, bam); index_bam(bam)

    handler = BarcodeHandler(["X-1"], RG_tags=["L1"])
    calls = count_snps(bam, {"chr1": np.array([10])}, handler,
                       joblib_n_jobs=None, joblib_verbosity=0)  # native=None auto
    assert calls["chr1"].n_snp_calls > 0, "RG path must fall back to the Python scanner"
    with pytest.raises(RuntimeError):
        count_snps(bam, {"chr1": np.array([10])}, handler,
                   joblib_n_jobs=None, joblib_verbosity=0, native=True)


def test_single_donor_doublet_prior_no_crash():
    from demuxalot_tpu.ops import likelihood as L

    mixing, names = L.pseudogenotype_mixing(["OnlyDonor"], doublet_prior=0.35)
    assert names == ["OnlyDonor"]
    assert mixing.shape == (1, 1)


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_native_count_coverage_matches_python(bam_problem):
    from demuxalot_tpu.bamio import BamReader
    from demuxalot_tpu.frontend.cellranger import parse_read
    from demuxalot_tpu.native.scanner import try_count_coverage_native

    filename, _genotypes, _bh = bam_problem
    for chrom, beg, end in [("chr1", 0, 900), ("chr1", 100, 400), ("chr2", 0, 700)]:
        native = try_count_coverage_native(filename, chrom, beg, end, parse_read)
        assert native is not None
        reader = BamReader(filename)
        python = reader.count_coverage(
            chrom, beg, end, read_callback=lambda r: parse_read(r) is not None
        )
        for n, p in zip(native, python):
            np.testing.assert_array_equal(n, p)

    # custom callable -> fallback requested
    assert try_count_coverage_native(filename, "chr1", 0, 100, lambda r: None) is None


@pytest.mark.skipif(not gxx_available, reason="no C++ toolchain")
def test_native_scanner_raises_on_corrupt_block(bam_problem, tmp_path):
    """Mid-file corruption must raise, never return partial counts."""
    filename, genotypes, bh = bam_problem
    raw = bytearray(open(filename, "rb").read())
    # flip bytes inside a block in the middle of the compressed stream
    mid = len(raw) // 2
    raw[mid] ^= 0xFF
    raw[mid + 1] ^= 0xFF
    corrupt = tmp_path / "corrupt.bam"
    corrupt.write_bytes(bytes(raw))
    import shutil as _sh

    _sh.copy(filename + ".bai", str(corrupt) + ".bai")
    c2p = genotypes.get_chromosome2positions()
    with pytest.raises(Exception) as exc_info:
        count_snps(str(corrupt), c2p, bh, joblib_n_jobs=None,
                   joblib_verbosity=0, native=True)
    print("native raised:", exc_info.value)
    # the Python fallback path must reject the same file too
    with pytest.raises(Exception) as exc_info_py:
        count_snps(str(corrupt), c2p, bh, joblib_n_jobs=None,
                    joblib_verbosity=0, native=False)
    print("python raised:", exc_info_py.value)
