"""Unit tests for utility pieces."""
import numpy as np

from demuxalot_tpu.utils import (
    FeatureLookup,
    compress_base,
    compress_bases_vectorized,
    decompress_base,
    fast_np_add_at_1d,
    hash_string,
)


def test_feature_lookup(n_combinations=1000, n_samples=100000):
    feat1_comb = np.random.randint(0, 100, n_combinations)
    feat2_comb = np.random.randint(0, 1000, n_combinations)
    feat3_comb = np.random.randint(0, 100_000, n_combinations)

    samples_id = np.random.randint(0, n_combinations, n_samples)
    feat1 = feat1_comb[samples_id]
    feat2 = feat2_comb[samples_id]
    feat3 = feat3_comb[samples_id]

    lookup = FeatureLookup(feat1, feat2, feat3)
    compressed, counts = lookup.compress(feat1, feat2, feat3)
    assert compressed.max() < n_combinations
    assert np.allclose(counts, np.bincount(compressed, minlength=len(counts)))
    feat1_new, feat2_new, feat3_new = lookup.uncompress(compressed)
    assert np.allclose(feat1, feat1_new)
    assert np.allclose(feat2, feat2_new)
    assert np.allclose(feat3, feat3_new)


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
