"""Cell-barcode whitelist and its dense index space.

Every device computation downstream is indexed by a dense barcode axis;
``BarcodeHandler`` owns that axis. It resolves the barcode tag of an
aligned read (this framework's own ``bamio`` read objects, or anything
duck-typed with ``has_tag``/``get_tag``) to a stable integer slot.

When several BAM files are merged, the same barcode string can occur in
more than one of them; passing ``RG_tags`` makes the identity the pair
``(barcode, read_group)`` so the files stay distinguishable. The public
surface matches the reference handler (demuxalot/utils.py:39-109).
"""
from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import Optional


class BarcodeHandler:
    """Maps barcode identities to slots 0..n_barcodes-1 (sorted order).

    Attributes forming the public surface:
      - ``barcode2index``: identity -> slot. A handler restricted to one
        read group (see :meth:`filter_to_rg_value`) only lists identities
        belonging to that group, while the slot numbering — and therefore
        ``n_barcodes`` — still covers the full space, so per-file scans
        write into the same dense axis.
      - ``ordered_barcodes``: identities sorted by slot.
      - ``use_rg``: whether identities are (barcode, RG) pairs.
      - ``tag``: the BAM tag consulted for the cell barcode.
    """

    def __init__(self, barcodes, RG_tags=None, tag: str = "CB"):
        """
        :param barcodes: iterable of barcode strings (a cellranger
            ``barcodes.csv`` column, say). Not a filename — see
            :meth:`from_file` for that.
        :param RG_tags: optional aligned iterable of read-group values;
            when given, identities become (barcode, RG) pairs. Merge BAMs
            with ``samtools merge -r`` so the RG tag survives merging.
        :param tag: which BAM tag carries the corrected cell barcode.
        """
        if isinstance(barcodes, (str, Path)):
            raise TypeError("pass the barcode list itself; use from_file() for paths")
        identities = list(barcodes)
        if RG_tags is not None:
            groups = list(RG_tags)
            if len(groups) != len(identities):
                raise ValueError("RG_tags must align one-to-one with barcodes")
            identities = list(zip(identities, groups))
        if len(set(identities)) != len(identities):
            raise ValueError("duplicate barcode identities in the whitelist")

        self.use_rg = RG_tags is not None
        self.tag = tag
        self.ordered_barcodes = sorted(identities)
        self.barcode2index = {identity: slot for slot, identity in enumerate(self.ordered_barcodes)}
        self._n_slots = len(self.ordered_barcodes)

    @property
    def n_barcodes(self) -> int:
        """Size of the dense barcode axis (stable under RG restriction)."""
        return self._n_slots

    def get_barcode_index(self, read) -> Optional[int]:
        """Slot of the read's barcode identity; None if absent or off-list."""
        if not read.has_tag(self.tag):
            return None
        identity = read.get_tag(self.tag)
        if self.use_rg:
            identity = (identity, read.get_tag("RG"))
        return self.barcode2index.get(identity)

    @classmethod
    def from_file(cls, barcodes_filename, **kwargs) -> "BarcodeHandler":
        """Build from a one-barcode-per-line csv(.gz), e.g. cellranger output."""
        import pandas as pd

        column = pd.read_csv(barcodes_filename, header=None).iloc[:, 0]
        return cls(column.astype(str).tolist(), **kwargs)

    def filter_to_rg_value(self, rg_value) -> "BarcodeHandler":
        """Restriction of an RG-aware handler to a single source file.

        The result resolves bare barcode strings (no RG pairing — each
        per-file scan sees exactly one read group) and keeps the original
        slot numbering, so results from different files concatenate into
        one dense axis. Identities of other read groups are simply absent.
        """
        if not self.use_rg:
            raise ValueError("handler was built without RG_tags")
        restricted = BarcodeHandler.__new__(BarcodeHandler)
        restricted.use_rg = False
        restricted.tag = self.tag
        restricted.barcode2index = {
            barcode: slot for (barcode, rg), slot in self.barcode2index.items() if rg == rg_value
        }
        restricted.ordered_barcodes = sorted(restricted.barcode2index, key=restricted.barcode2index.get)
        restricted._n_slots = self._n_slots
        return restricted

    def __repr__(self):
        if self.use_rg:
            per_group = Counter(rg for _barcode, rg in self.barcode2index)
            detail = ", ".join(f"{rg}: {n}" for rg, n in sorted(per_group.items()))
            return f"BarcodeHandler({self.n_barcodes} barcodes across read groups {{{detail}}})"
        return f"BarcodeHandler({self.n_barcodes} barcodes)"
