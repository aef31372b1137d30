"""Tests for the self-contained BGZF/BAM/BAI/VCF I/O subsystem.

Round-trips through our own writer/reader, and — when the upstream example
data is present on this machine — parses a real htslib-produced BAM/BAI to
validate format compatibility.
"""
import numpy as np
import pytest

from demuxalot_tpu.bamio import (
    AlignedRead,
    BamReader,
    BamWriter,
    BgzfReader,
    BgzfWriter,
    VariantFile,
    index_bam,
    qualitystring_to_array,
    read_vcf_to_header_and_pandas,
    sort_bam,
)

from conftest import REFERENCE_EXAMPLE_DATA


def test_bgzf_roundtrip(tmp_path):
    path = tmp_path / "data.bgz"
    rng = np.random.RandomState(0)
    payload = rng.bytes(300_000)
    with BgzfWriter(path) as w:
        for i in range(0, len(payload), 7919):
            w.write(payload[i : i + 7919])
    reader = BgzfReader(path)
    assert reader.read_all() == payload

    reader2 = BgzfReader(path)
    assert reader2.read(1000) == payload[:1000]
    assert reader2.read(100_000) == payload[1000:101_000]


def _make_read(name, ref_id, start, seq, cb="AACC-1", ub="ACGTACGTAC", qual=30):
    a = AlignedRead()
    a.query_name = name
    a.query_sequence = seq
    a.flag = 99
    a.reference_id = ref_id
    a.reference_start = start
    a.mapping_quality = 255
    a.cigar = ((0, len(seq)),)
    a.template_length = len(seq)
    a.query_qualities = [qual] * len(seq)
    a.tags = (
        ("NM", 1),
        ("RG", "L1"),
        ("NH", 1),
        ("AS", len(seq) - 2),
        ("CB", cb),
        ("UB", ub),
    )
    return a


def test_bam_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "test.bam")
    header = {"HD": {"VN": "1.0"}, "SQ": [dict(LN=1000, SN="chr1"), dict(LN=2000, SN="chr2")]}
    rng = np.random.RandomState(1)
    reads = []
    for i in range(200):
        ref_id = int(rng.randint(2))
        start = int(rng.randint(0, 900))
        seq = "".join(rng.choice(list("ACGT"), 50))
        reads.append(_make_read(f"r{i:03}", ref_id, start, seq))

    with BamWriter(path, header) as w:
        for r in reads:
            w.write(r)

    parsed = list(BamReader(path))
    assert len(parsed) == len(reads)
    for orig, back in zip(reads, parsed):
        assert back.query_name == orig.query_name
        assert back.reference_id == orig.reference_id
        assert back.reference_start == orig.reference_start
        assert back.query_sequence == orig.query_sequence
        assert back.query_qualities == orig.query_qualities
        assert back.cigartuples == orig.cigartuples
        assert back.get_tag("CB") == orig.get_tag("CB")
        assert back.get_tag("AS") == orig.get_tag("AS")
        assert back.get_tag("NH") == 1
        assert back.reference_end == orig.reference_start + 50


def test_bam_sort_index_fetch(tmp_path):
    path = str(tmp_path / "test.bam")
    header = {"HD": {"VN": "1.0"}, "SQ": [dict(LN=100_000, SN="chr1"), dict(LN=50_000, SN="chr2")]}
    rng = np.random.RandomState(2)
    with BamWriter(path, header) as w:
        for i in range(2000):
            ref_id = int(rng.randint(2))
            limit = 100_000 if ref_id == 0 else 50_000
            start = int(rng.randint(0, limit - 100))
            seq = "".join(rng.choice(list("ACGT"), 100))
            w.write(_make_read(f"r{i:04}", ref_id, start, seq))

    sort_bam(path, path)
    index_bam(path)

    reader = BamReader(path)
    # sorted order
    all_reads = list(reader)
    keys = [(r.reference_id, r.reference_start) for r in all_reads]
    assert keys == sorted(keys)

    # fetch returns exactly the overlapping reads
    for chrom, beg, end in [("chr1", 5000, 10_000), ("chr1", 0, 100), ("chr2", 40_000, 50_000)]:
        ref_id = reader.header.ref2id[chrom]
        expected = {
            r.query_name
            for r in all_reads
            if r.reference_id == ref_id and r.reference_start < end and r.reference_end > beg
        }
        got = {r.query_name for r in reader.fetch(chrom, beg, end)}
        assert got == expected, f"fetch mismatch for {chrom}:{beg}-{end}"

    # index statistics
    stats = {s.contig: s.mapped for s in reader.get_index_statistics()}
    from collections import Counter

    truth = Counter("chr1" if r.reference_id == 0 else "chr2" for r in all_reads)
    assert stats == dict(truth)


def test_count_coverage(tmp_path):
    path = str(tmp_path / "cov.bam")
    header = {"HD": {"VN": "1.0"}, "SQ": [dict(LN=1000, SN="chr1")]}
    with BamWriter(path, header) as w:
        # three reads over position 100..150, all 'A' at offset 0 except one 'C'
        w.write(_make_read("r1", 0, 100, "A" * 50))
        w.write(_make_read("r2", 0, 100, "C" + "A" * 49))
        w.write(_make_read("r3", 0, 120, "G" * 50))
        w.write(_make_read("r4", 0, 130, "T" * 50, qual=5))  # below quality threshold
    sort_bam(path, path)
    index_bam(path)

    reader = BamReader(path)
    a, c, g, t = reader.count_coverage("chr1", 100, 200)
    assert a[0] == 1 and c[0] == 1
    assert a[1] == 2
    assert g[25] == 1
    assert t.sum() == 0  # r4 filtered by quality_threshold=15
    # callback filtering
    a2, *_ = reader.count_coverage("chr1", 100, 200, read_callback=lambda r: r.query_name != "r2")
    assert a2[1] == 1


def test_qualitystring_to_array():
    assert qualitystring_to_array("<<") == [27, 27]
    assert qualitystring_to_array("I") == [40]


@pytest.mark.skipif(not REFERENCE_EXAMPLE_DATA.exists(), reason="reference example data not present")
def test_parse_real_htslib_bam():
    """Parse a real cellranger-style BAM + BAI produced by htslib."""
    bam = BamReader(str(REFERENCE_EXAMPLE_DATA / "test_bamfile.bam"))
    assert bam.references == ["chr1", "chr2", "chr3"]
    assert bam.get_reference_length("chr1") == 1000

    n = 0
    seen_tags = False
    for read in bam:
        n += 1
        if not seen_tags and read.has_tag("CB"):
            assert isinstance(read.get_tag("CB"), str)
            assert read.has_tag("UB")
            assert isinstance(read.get_tag("AS"), int)
            seen_tags = True
        assert read.reference_end is not None
    assert n > 1000
    assert seen_tags

    # region fetch against htslib-generated BAI
    sub = list(bam.fetch("chr1", 100, 300))
    assert len(sub) > 0
    for read in sub:
        assert read.reference_start < 300 and read.reference_end > 100
    # full-chromosome fetch == manual filter over full iteration
    whole = [r for r in bam if r.reference_id == 0]
    fetched = list(bam.fetch("chr1"))
    assert len(whole) == len(fetched)

    stats = bam.get_index_statistics()
    assert sum(s.mapped for s in stats) > 1000


@pytest.mark.skipif(not REFERENCE_EXAMPLE_DATA.exists(), reason="reference example data not present")
def test_parse_real_vcf():
    vcf = VariantFile(str(REFERENCE_EXAMPLE_DATA / "test_genotypes.vcf"))
    assert vcf.sample_names == ["Donor01", "Donor02", "Donor03", "Donor04"]
    records = list(vcf.fetch())
    assert len(records) > 100
    rec = records[0]
    assert rec.chrom == "chr1"
    assert rec.pos == 1  # 1-based
    assert rec.alleles == ("G", "T")
    assert rec.samples["Donor01"]["GT"] == (0, 0)
    assert rec.samples["Donor02"]["GT"] == (1, 1)

    header, df = read_vcf_to_header_and_pandas(str(REFERENCE_EXAMPLE_DATA / "test_genotypes.vcf"))
    assert len(df) == len(records)
    assert df["POS"].iloc[0] == 0  # converted to 0-based


def test_empty_bam_roundtrip(tmp_path):
    """A BAM with zero records sorts, indexes, and fetches cleanly."""
    path = str(tmp_path / "empty.bam")
    with BamWriter(path, {"HD": {"VN": "1.0"}, "SQ": [dict(LN=100, SN="chr1")]}):
        pass
    sort_bam(path, path)
    index_bam(path)
    reader = BamReader(path)
    assert list(reader) == []
    assert list(reader.fetch("chr1", 0, 100)) == []
    assert reader.get_index_statistics()[0].mapped == 0


def test_reader_closes_file_descriptor(tmp_path):
    import os

    path = str(tmp_path / "fd.bam")
    with BamWriter(path, {"HD": {"VN": "1.0"}, "SQ": [dict(LN=100, SN="chr1")]}) as w:
        w.write(_make_read("r0", 0, 10, "A" * 20))
    n_before = len(os.listdir("/proc/self/fd"))
    for _ in range(50):
        with BamReader(path) as r:
            list(r)
    n_after = len(os.listdir("/proc/self/fd"))
    assert n_after <= n_before + 2, "file descriptors are leaking"


def test_bamwriter_tag_types_roundtrip(tmp_path):
    path = str(tmp_path / "tags.bam")
    a = _make_read("r0", 0, 10, "ACGT")
    a.tags = (("NH", 1), ("AS", 2), ("CB", "XYZ-1"), ("UB", "ACGT"),
              ("XF", 1.5), ("XB", [1, 2, 3]))
    with BamWriter(path, {"HD": {"VN": "1.0"}, "SQ": [dict(LN=100, SN="chr1")]}) as w:
        w.write(a)
    (back,) = list(BamReader(path))
    assert back.get_tag("XF") == pytest.approx(1.5)
    assert back.get_tag("XB") == [1, 2, 3]
    assert back.get_tag("CB") == "XYZ-1"


@pytest.mark.skipif(not REFERENCE_EXAMPLE_DATA.exists(), reason="reference example data not present")
def test_our_bai_matches_htslib_bai(tmp_path):
    """Index the real htslib BAM ourselves; fetches must match htslib's index."""
    import shutil

    from demuxalot_tpu.bamio.bai import build_bai

    src = REFERENCE_EXAMPLE_DATA / "test_bamfile.bam"
    ours = tmp_path / "copy.bam"
    shutil.copy(src, ours)
    build_bai(ours)  # writes copy.bam.bai with OUR builder

    htslib_reader = BamReader(str(src))     # uses htslib's .bai
    our_reader = BamReader(str(ours))       # uses ours
    for chrom, beg, end in [("chr1", 0, 1000), ("chr2", 100, 350), ("chr3", 777, 900)]:
        a = [(r.query_name, r.reference_start) for r in htslib_reader.fetch(chrom, beg, end)]
        b = [(r.query_name, r.reference_start) for r in our_reader.fetch(chrom, beg, end)]
        assert a == b, f"fetch mismatch for {chrom}:{beg}-{end}"

    ha = {s.contig: (s.mapped, s.unmapped) for s in htslib_reader.get_index_statistics()}
    oa = {s.contig: (s.mapped, s.unmapped) for s in our_reader.get_index_statistics()}
    assert ha == oa


# -- corruption robustness: fail loudly, never silently short-read ----------

def _bgzf_bytes(payload: bytes) -> bytes:
    import io
    buf = io.BytesIO()
    with BgzfWriter(buf) as w:
        w.write(payload)
    return buf.getvalue()


def test_bgzf_rejects_garbage_prefix():
    with pytest.raises(ValueError, match="not a BGZF"):
        BgzfReader(b"\x00garbage" * 10)


def test_bgzf_truncated_block_raises(tmp_path):
    rng = np.random.RandomState(1)
    payload = rng.bytes(200_000)  # several blocks
    data = _bgzf_bytes(payload)
    # cut INSIDE the second block (a cut exactly on a block boundary is
    # indistinguishable from EOF without an EOF-marker check, htslib-parity)
    from demuxalot_tpu.bamio.bgzf import _parse_block_header
    _xlen, bsize0 = _parse_block_header(data, 0)
    cut = bsize0 + min(1000, len(data) - bsize0 - 1)
    r = BgzfReader(data[:cut])
    try:
        got = r.read_all()
    except (EOFError, ValueError) as e:
        print("raised as expected:", e)
        return
    raise AssertionError(
        f"mid-block truncation read {len(got)} bytes without an error"
    )


def test_bgzf_corrupt_deflate_bytes_raise(tmp_path):
    import zlib as _zlib
    rng = np.random.RandomState(2)
    payload = rng.bytes(150_000)
    data = bytearray(_bgzf_bytes(payload))
    # flip bytes in the middle of the second block's compressed data
    data[len(data) // 2] ^= 0xFF
    data[len(data) // 2 + 1] ^= 0xFF
    r = BgzfReader(bytes(data))
    with pytest.raises((_zlib.error, ValueError)):
        r.read_all()


def test_bgzf_isize_mismatch_raises():
    rng = np.random.RandomState(3)
    payload = rng.bytes(1000)
    data = bytearray(_bgzf_bytes(payload))
    # ISIZE is the last 4 bytes of the first (only data-carrying) block;
    # find the first block size from its header and corrupt its ISIZE
    from demuxalot_tpu.bamio.bgzf import _parse_block_header
    _xlen, bsize = _parse_block_header(bytes(data), 0)
    data[bsize - 1] ^= 0x55
    with pytest.raises(ValueError, match="ISIZE"):
        BgzfReader(bytes(data)).read_all()


def test_bgzf_seek_past_eof_raises():
    data = _bgzf_bytes(b"hello world")
    r = BgzfReader(data)
    with pytest.raises(ValueError, match="corrupt virtual offset"):
        r.seek_virtual(((len(data) + 4096) << 16) | 5)


def test_bam_corrupt_record_lengths_raise(tmp_path):
    """Bit-flipped BAM payloads must raise, not yield phantom reads."""
    path = tmp_path / "c.bam"
    with BamWriter(path, {"chr1": 1000}) as w:
        for i in range(50):
            w.write(_make_read(f"r{i}", 0, i * 3, "A" * 30))
    raw = BgzfReader(str(path)).read_all()
    bad = bytearray(raw)
    # corrupt block_size fields region in the middle of the record stream
    bad[len(bad) // 2] = 0xFF
    bad[len(bad) // 2 + 1] = 0xFF
    import io
    buf = io.BytesIO()
    with BgzfWriter(buf) as w:
        w.write(bytes(bad))
    corrupted = tmp_path / "corrupt.bam"
    corrupted.write_bytes(buf.getvalue())
    try:
        reads = list(BamReader(str(corrupted)))
    except Exception as e:
        print("raised as expected:", type(e).__name__, e)
        return
    # no exception: the output must then be byte-identical to the original
    # (anything else is silent corruption)
    original = list(BamReader(str(path)))
    assert len(reads) == len(original), (
        f"corruption silently changed the read count: {len(reads)} vs {len(original)}"
    )
    for a, b in zip(reads, original):
        assert (a.query_name, a.reference_start, a.query_sequence) == (
            b.query_name, b.reference_start, b.query_sequence
        ), "corruption silently altered record content"
    raise AssertionError("two flipped bytes in the record stream went undetected")


# ---------------------------------------------------------------------------
# SAM ingestion and CRAM rejection (reference parity: pysam.AlignmentFile
# opens SAM/CRAM transparently, /root/reference/demuxalot/snp_counter.py:247)
# ---------------------------------------------------------------------------

def _small_bam(tmp_path, n_barcodes=64):
    from demuxalot_tpu.sim import generate_bam_file

    filename, genotypes, _ids, barcode2donor = generate_bam_file(
        str(tmp_path / "sam_src.bam"),
        n_genotypes=4,
        n_barcodes=n_barcodes,
        n_reads_per_barcode=20,
        chromosome2length={"chr1": 6_000, "chr2": 6_000},
    )
    return filename, genotypes, barcode2donor


@pytest.mark.parametrize("suffix", [".sam", ".sam.gz"])
def test_sam_counts_match_bam(tmp_path, suffix):
    """count_snps over a SAM conversion reproduces the BAM-derived calls."""
    from demuxalot_tpu import BarcodeHandler, count_snps
    from demuxalot_tpu.bamio import SamReader, open_alignment, write_sam

    filename, genotypes, barcode2donor = _small_bam(tmp_path)
    sam_path = tmp_path / ("converted" + suffix)
    with BamReader(filename) as reader:
        write_sam(sam_path, reader.header, iter(reader))

    opened = open_alignment(sam_path)
    assert isinstance(opened, SamReader)
    assert opened.references == ["chr1", "chr2"]

    handler = BarcodeHandler(list(barcode2donor))
    positions = genotypes.get_chromosome2positions()
    calls_bam = count_snps(filename, positions, handler,
                           joblib_n_jobs=None, joblib_verbosity=0, native=False)
    calls_sam = count_snps(str(sam_path), positions, handler,
                           joblib_n_jobs=None, joblib_verbosity=0, native=False)
    assert set(calls_bam) == set(calls_sam)
    for chrom in calls_bam:
        a, b = calls_bam[chrom], calls_sam[chrom]
        a.minimize_memory_footprint()
        b.minimize_memory_footprint()
        # identical molecules and calls (order included: both scanners walk
        # coordinate order and the consensus chain is deterministic)
        assert np.array_equal(a.molecules, b.molecules)
        assert np.array_equal(a.snp_calls, b.snp_calls)


def test_sam_native_scanner_falls_back(tmp_path):
    """native=None on SAM silently falls back; native=True explains itself."""
    from demuxalot_tpu import BarcodeHandler, count_snps
    from demuxalot_tpu.bamio import write_sam

    filename, genotypes, barcode2donor = _small_bam(tmp_path, n_barcodes=16)
    sam_path = tmp_path / "converted.sam"
    with BamReader(filename) as reader:
        write_sam(sam_path, reader.header, iter(reader))
    handler = BarcodeHandler(list(barcode2donor))
    positions = genotypes.get_chromosome2positions()
    calls = count_snps(str(sam_path), positions, handler,
                       joblib_n_jobs=None, joblib_verbosity=0)  # native=auto
    assert sum(c.n_snp_calls for c in calls.values()) > 0
    with pytest.raises(RuntimeError, match="requires BAM input"):
        count_snps(str(sam_path), positions, handler,
                   joblib_n_jobs=None, joblib_verbosity=0, native=True)


def test_cram_raises_curated_error(tmp_path):
    from demuxalot_tpu.bamio import open_alignment, sniff_format

    cram = tmp_path / "sample.cram"
    cram.write_bytes(b"CRAM\x03\x00" + b"\x00" * 64)
    assert sniff_format(cram) == "cram"
    with pytest.raises(ValueError, match="samtools view -b"):
        open_alignment(cram)


def test_sniff_format_identifies_bam(tmp_path):
    from demuxalot_tpu.bamio import BamReader as _BR, open_alignment, sniff_format

    filename, _genotypes, _b2d = _small_bam(tmp_path, n_barcodes=8)
    assert sniff_format(filename) == "bam"
    assert isinstance(open_alignment(filename), _BR)


def test_sam_fetch_window_semantics(tmp_path):
    """SamReader.fetch matches BamReader.fetch on overlap windows."""
    from demuxalot_tpu.bamio import write_sam
    from demuxalot_tpu.bamio.sam import SamReader

    filename, _genotypes, _b2d = _small_bam(tmp_path, n_barcodes=32)
    sam_path = tmp_path / "converted.sam"
    with BamReader(filename) as reader:
        write_sam(sam_path, reader.header, iter(reader))
    sam = SamReader(sam_path)
    with BamReader(filename) as bam:
        for window in [(0, 500), (300, 1200), (5_500, 6_000), (2_000, 2_001)]:
            got = [(r.query_name, r.reference_start)
                   for r in sam.fetch("chr1", *window)]
            want = [(r.query_name, r.reference_start)
                    for r in bam.fetch("chr1", *window)]
            assert got == want
