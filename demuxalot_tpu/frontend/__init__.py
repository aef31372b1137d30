from .snp_counter import (
    ChromosomeSNPLookup,
    CompressedSNPCalls,
    consensus_call_molecule,
    count_call_variants_for_chromosome,
    count_snps,
    load_snp_counts,
    prepare_counting_tasks,
    save_snp_counts,
)

__all__ = [
    "ChromosomeSNPLookup",
    "CompressedSNPCalls",
    "consensus_call_molecule",
    "count_call_variants_for_chromosome",
    "count_snps",
    "load_snp_counts",
    "save_snp_counts",
    "prepare_counting_tasks",
]
