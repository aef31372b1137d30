"""Perfect-hash compression of integer feature tuples into one dense id.

Mixed-radix encoding + ``np.unique`` + ``searchsorted``; used to collapse
(snp, barcode)-style keys into contiguous ids for host-side aggregation
(reference: demuxalot/utils.py:207-262). Device-side aggregation uses sorted
segment ids instead, but this host utility is part of the public surface.
"""
from __future__ import annotations

import numpy as np


class FeatureLookup:
    def __init__(self, *features):
        self.n_categories = [np.max(f) + 1 for f in features]
        total_categories = np.prod(self.n_categories)
        if total_categories < 2**7:
            self.dtype = "int8"
        elif total_categories < 2**15:
            self.dtype = "int16"
        elif total_categories < 2**31:
            self.dtype = "int32"
        elif total_categories < 2**63:
            self.dtype = "int64"
        else:
            raise RuntimeError("too many combinations")

        self._lookup = np.unique(self._to_internal_compressed(*features))

    @property
    def nvalues(self) -> int:
        return len(self._lookup)

    def _to_internal_compressed(self, *features):
        result = np.zeros(len(features[0]), dtype=self.dtype)
        assert len(features) == len(self.n_categories)
        for f, n_cats in zip(features, self.n_categories):
            assert f.max() < n_cats
            result *= n_cats
            result += f.astype(self.dtype)
        return result

    def _from_internal_compressed(self, indices):
        result = []
        for n_cats in self.n_categories[::-1]:
            result.append(indices % n_cats)
            indices = indices // n_cats

        assert np.all(indices == 0)
        return result[::-1]

    def lookup_for_individual_features(self):
        return self._from_internal_compressed(self._lookup)

    def compress(self, *features):
        compressed_index = np.searchsorted(self._lookup, self._to_internal_compressed(*features))
        for reconstructed, original in zip(self.uncompress(compressed_index), features):
            np.testing.assert_equal(original, reconstructed)
        counts_of_compressed = np.bincount(compressed_index, minlength=len(self._lookup))
        return compressed_index, counts_of_compressed

    def uncompress(self, compressed_index):
        return self._from_internal_compressed(self._lookup[compressed_index])
