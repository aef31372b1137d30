from .snp_counter import (
    ChromosomeSNPLookup,
    CompressedSNPCalls,
    consensus_call_molecule,
    count_call_variants_for_chromosome,
    count_snps,
    prepare_counting_tasks,
)

__all__ = [
    "ChromosomeSNPLookup",
    "CompressedSNPCalls",
    "consensus_call_molecule",
    "count_call_variants_for_chromosome",
    "count_snps",
    "prepare_counting_tasks",
]
