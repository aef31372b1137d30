"""Unit tests for utility pieces."""
import numpy as np
import pytest

from demuxalot_tpu.utils import (
    FeatureLookup,
    compress_base,
    compress_bases_vectorized,
    decompress_base,
    fast_np_add_at_1d,
    hash_string,
)


def test_feature_lookup_round_trip():
    # A structured (barcode, snp) stream: 7 barcodes x 5 snps, but only the
    # upper-triangular pairs ever co-occur, each with a known multiplicity.
    pairs = [(b, s) for b in range(7) for s in range(5) if s <= b % 5]
    mult = [1 + (b + s) % 4 for b, s in pairs]
    barcode = np.repeat([b for b, _ in pairs], mult)
    snp = np.repeat([s for _, s in pairs], mult)

    lut = FeatureLookup(barcode, snp)
    assert lut.nvalues == len(pairs)

    dense, counts = lut.compress(barcode, snp)
    # dense ids are a contiguous 0..K-1 relabeling
    assert sorted(np.unique(dense)) == list(range(len(pairs)))
    # counts reflect the multiplicities we planted (dense order is the
    # lexicographic order of the tuples, which is how we built `pairs`)
    np.testing.assert_array_equal(counts, mult)
    # inversion restores the original streams element-for-element
    back_b, back_s = lut.uncompress(dense)
    np.testing.assert_array_equal(back_b, barcode)
    np.testing.assert_array_equal(back_s, snp)
    # the per-feature catalog enumerates each distinct tuple exactly once
    cat_b, cat_s = lut.lookup_for_individual_features()
    assert list(zip(cat_b.tolist(), cat_s.tolist())) == pairs


def test_feature_lookup_single_feature_and_subset_queries():
    vals = np.array([9, 2, 9, 40, 2, 2])
    lut = FeatureLookup(vals)
    assert lut.nvalues == 3  # {2, 9, 40}
    dense, counts = lut.compress(np.array([40, 2]))
    np.testing.assert_array_equal(lut.uncompress(dense)[0], [40, 2])
    # counts are for the QUERY stream, not the construction stream:
    # sorted catalog is [2, 9, 40], the query hits ids 2 and 0 once each
    np.testing.assert_array_equal(dense, [2, 0])
    np.testing.assert_array_equal(counts, [1, 0, 1])


def test_feature_lookup_rejects_unseen_tuples():
    lut = FeatureLookup(np.array([0, 1]), np.array([5, 6]))
    with pytest.raises(KeyError):
        lut.compress(np.array([0]), np.array([6]))  # (0,6) never observed


def test_feature_lookup_overflow_guard():
    big = np.array([2**40], dtype=np.int64)
    with pytest.raises(RuntimeError):
        FeatureLookup(big, big)  # 2^80 key space cannot fit int64 keys


def test_base_encoding():
    for i, base in enumerate("ACGTN"):
        assert compress_base(base) == i
        assert decompress_base(i) == base
    arr = np.array(list("ACGTNTGCA"))
    np.testing.assert_array_equal(
        compress_bases_vectorized(arr), [compress_base(b) for b in arr]
    )


def test_hash_string_deterministic():
    # reference residue chain: polynomial base-5 hash mod largest prime < 2^32
    assert hash_string("") == 0
    assert hash_string("A") == ord("A")
    assert hash_string("AC") == ord("A") * 5 + ord("C")
    assert hash_string("ACGTACGTAC") == hash_string("ACGTACGTAC")
    assert hash_string("ACGTACGTAC") != hash_string("ACGTACGTAG")
    assert 0 <= hash_string("T" * 30) < 2147483629


def test_fast_np_add_at_1d():
    x = np.zeros(5, dtype="float32")
    fast_np_add_at_1d(x, np.array([0, 1, 1, 4]), np.array([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(x, [1, 5, 0, 0, 4])
