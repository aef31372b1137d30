"""Read-filtering callback tuned for cellranger output.

The ``parse_read`` plugin interface: given an aligned read, return ``None``
to discard it, or ``(p_misaligned, compressed_umi)`` to keep it. Users can
pass their own callable (or a ``functools.partial`` of this one) to
``count_snps`` — e.g. to change the UMI tag (see examples/3).

Filter rules match the reference (demuxalot/cellranger_specific.py:13-36):
alignment score within ``score_diff_max`` of read length (≤2 edits),
single-hit (NH), UMI tag present, mapq above threshold.
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..utils.encoding import hash_string


def parse_read(
    read,
    umi_tag: str = "UB",
    nhits_tag: str = "NH",
    score_tag: str = "AS",
    score_diff_max: int = 8,
    mapq_threshold: int = 20,
    p_misaligned_default: float = 0.01,
) -> Optional[Tuple[float, int]]:
    """Return None if the read should be ignored, else (p_misaligned, umi_hash).

    A kept read can still be dropped later if its cell barcode is not in the
    whitelist.
    """
    if read.get_tag(score_tag) <= len(read.seq) - score_diff_max:
        # too many edits
        return None
    if read.get_tag(nhits_tag) > 1:
        # multi-mapped
        return None
    if not read.has_tag(umi_tag):
        # does not have molecule barcode
        return None
    if read.mapq < mapq_threshold:
        # should be implied by NH, but just in case
        return None

    return p_misaligned_default, hash_string(read.get_tag(umi_tag))
