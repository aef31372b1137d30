"""Read-filtering plugin for cellranger-aligned BAMs.

A ``parse_read`` plugin decides, per aligned read, whether the read is
usable evidence, returning ``None`` to drop it or
``(p_misaligned, umi_code)`` to keep it. ``count_snps`` accepts any such
callable — pass a ``functools.partial`` of this one to retune tags or
thresholds (see examples/3), or a custom function for other aligners.

The default acceptance rules are behavioral parity with the reference
plugin (demuxalot/cellranger_specific.py:13-36); thresholds are exposed as
keyword parameters rather than hard-coded.
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
    """Accept/reject one read; on accept return (p_misaligned, umi_code).

    A read survives only if all of the following hold:
      * its alignment score is within ``score_diff_max`` of the read
        length — cellranger's AS tops out at the read length, so this
        bounds the edit count (≤2 at the default);
      * the aligner placed it at exactly one locus (``NH == 1``);
      * it carries a corrected molecule barcode under ``umi_tag``;
      * mapping quality clears ``mapq_threshold`` — with unique placement
        this is near-redundant, kept as a belt-and-braces guard.

    Cell-barcode whitelisting happens later, in the counting loop.
    """
    if read.get_tag(score_tag) <= len(read.seq) - score_diff_max:
        return None
    if read.get_tag(nhits_tag) > 1:
        return None
    if not read.has_tag(umi_tag):
        return None
    if read.mapq < mapq_threshold:
        return None
    return p_misaligned_default, hash_string(read.get_tag(umi_tag))
