"""Cell-barcode whitelist handling.

``BarcodeHandler`` maps barcode strings (optionally ``(barcode, RG)`` pairs
when several BAM files are merged) to dense integer indices. The dense index
is the barcode-shard axis of every device computation downstream.

Interface parity with the reference (demuxalot/utils.py:39-109); reads here
are this framework's own :class:`demuxalot_tpu.bamio.bam.AlignedRead`
objects (duck-typed: anything with ``has_tag``/``get_tag`` works).
"""
from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import Optional

import pandas as pd


class BarcodeHandler:
    def __init__(self, barcodes, RG_tags=None, tag: str = "CB"):
        """
        :param barcodes: list of barcode strings (e.g. cellranger CB values)
        :param RG_tags: optional list of the same length; when provided, barcode
            identity becomes the pair (barcode, RG). Useful when merging several
            BAM files (pass ``-r`` to ``samtools merge`` so RG tags survive).
        :param tag: BAM tag holding the (corrected) cell barcode, default 'CB'.
        """
        assert not isinstance(barcodes, (str, Path)), "construct by passing a list of barcodes"
        barcodes = list(barcodes)
        self.use_rg = False
        if RG_tags is not None:
            RG_tags = list(RG_tags)
            assert len(barcodes) == len(RG_tags), "RG tags should align with barcodes"
            barcodes = [(barcode, rg) for barcode, rg in zip(barcodes, RG_tags)]
            self.use_rg = True

        assert len(set(barcodes)) == len(barcodes), "all passed barcodes should be unique"
        self.ordered_barcodes = sorted(barcodes)
        self.barcode2index = {bc: i for i, bc in enumerate(self.ordered_barcodes)}
        self.tag = tag

    @property
    def n_barcodes(self) -> int:
        return len(self.barcode2index)

    def get_barcode_index(self, read) -> Optional[int]:
        """Dense index for the read's barcode, or None if not whitelisted."""
        if not read.has_tag(self.tag):
            return None
        if self.use_rg:
            barcode = read.get_tag(self.tag), read.get_tag("RG")
        else:
            barcode = read.get_tag(self.tag)
        return self.barcode2index.get(barcode, None)

    @staticmethod
    def from_file(barcodes_filename, **kwargs) -> "BarcodeHandler":
        """Load from a barcodes.csv(.gz) with one barcode per line."""
        barcodes = pd.read_csv(barcodes_filename, header=None)[0].values.astype("str")
        return BarcodeHandler(barcodes, **kwargs)

    def filter_to_rg_value(self, rg_value) -> "BarcodeHandler":
        """Copy restricted to one source file (RG value), preserving indices.

        Barcodes belonging to other RG values are replaced by dummy keys so the
        dense index space stays identical across the per-file handlers
        (reference: demuxalot/utils.py:88-99).
        """
        assert self.use_rg
        result = BarcodeHandler(self.barcode2index, tag=self.tag)
        result.barcode2index = {
            (barcode if rg == rg_value else index): index
            for (barcode, rg), index in self.barcode2index.items()
        }
        result.ordered_barcodes = list(result.barcode2index)
        result.use_rg = False
        return result

    def __repr__(self):
        if not self.use_rg:
            return f"<BarcodeHandler with {self.n_barcodes} barcodes>"
        rg_stats = Counter(rg for barcode, rg in self.barcode2index)
        return (
            f"<BarcodeHandler with {self.n_barcodes} barcodes. "
            f"Number of barcodes for RG codes: {rg_stats}>"
        )
