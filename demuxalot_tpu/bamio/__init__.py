"""Self-contained genomics I/O: BGZF, BAM (+BAI index), VCF.

The reference delegated all of this to pysam/htslib; this framework carries
its own implementation (pure Python plus an optional C++ fast path) so the
CPU ingest frontend has no external native dependencies.
"""
from .bai import BaiIndex, build_bai
from .bam import (
    AlignedRead,
    BamHeader,
    BamReader,
    BamWriter,
    index_bam,
    qualitystring_to_array,
    sort_bam,
)
from .bgzf import BgzfReader, BgzfWriter
from .sam import SamReader, open_alignment, sniff_format, write_sam
from .vcf import VariantFile, VariantRecord, read_vcf_to_header_and_pandas

# pysam-flavoured alias; format-polymorphic like pysam.AlignmentFile
# (BAM via BamReader, SAM via SamReader, CRAM -> curated error)
AlignmentFile = open_alignment

__all__ = [
    "AlignedRead",
    "AlignmentFile",
    "BaiIndex",
    "BamHeader",
    "BamReader",
    "BamWriter",
    "BgzfReader",
    "BgzfWriter",
    "SamReader",
    "VariantFile",
    "VariantRecord",
    "build_bai",
    "index_bam",
    "open_alignment",
    "qualitystring_to_array",
    "read_vcf_to_header_and_pandas",
    "sniff_format",
    "sort_bam",
    "write_sam",
]
