from . import likelihood, packing
from .likelihood import (
    barcode_logits,
    doublet_penalties,
    genotype_addition_from_posteriors,
    probs_from_betas,
    pseudogenotype_mixing,
)
from .packing import (
    DeviceCalls,
    MoleculeCalls,
    device_pack_barcode_calls,
    molecule_calls_to_barcode_calls,
    pack_calls,
)

__all__ = [
    "DeviceCalls",
    "MoleculeCalls",
    "barcode_logits",
    "device_pack_barcode_calls",
    "doublet_penalties",
    "genotype_addition_from_posteriors",
    "likelihood",
    "molecule_calls_to_barcode_calls",
    "pack_calls",
    "packing",
    "probs_from_betas",
    "pseudogenotype_mixing",
]
