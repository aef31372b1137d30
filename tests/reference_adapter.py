"""Adapter for head-to-head parity runs against the read-only reference.

Imports the reference implementation from /root/reference with ``pysam``
stubbed (absent in this environment; the EM-core code paths never touch
it), and converts this framework's objects into the reference's input
types so both EM implementations can run on byte-identical inputs.

Used by the perf-marked quality test to regenerate the parity section of
QUALITY.json every round. Helper module, not a test file.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def load_reference():
    """Import the reference ``demuxalot`` package, or None if unavailable.

    The reference's modules annotate functions with pysam types at class
    scope, so the stub needs attribute placeholders — they are never
    instantiated on the pack_calls/EM path this adapter exercises.
    """
    if not (REFERENCE_ROOT / "demuxalot" / "__init__.py").exists():
        return None
    if "pysam" not in sys.modules:
        stub = types.ModuleType("pysam")

        class _NeverInstantiated:
            def __init__(self, *a, **k):
                raise RuntimeError("pysam stub: IO paths are not available")

        for name in ("AlignedRead", "AlignedSegment", "AlignmentFile", "VariantFile"):
            setattr(stub, name, _NeverInstantiated)
        sys.modules["pysam"] = stub
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import demuxalot as reference

    return reference


def to_reference_genotypes(reference, genotypes, tmp_path):
    """Recreate our ProbabilisticGenotypes state as the reference's type.

    Round-trips through the shared parquet betas schema (index
    CHROM/POS/BASE, columns = donor names) — the checkpoint format both
    implementations read and write.
    """
    checkpoint = str(Path(tmp_path) / "parity_betas.parquet")
    genotypes.save_betas(checkpoint)
    ref_genotypes = reference.ProbabilisticGenotypes(
        genotype_names=list(genotypes.genotype_names),
        default_prior=genotypes.default_prior,
    )
    ref_genotypes.add_prior_betas(checkpoint)
    return ref_genotypes


def to_reference_calls(reference, chromosome2compressed_snp_calls):
    """Copy our per-chromosome calls into reference CompressedSNPCalls.

    Both types carry identical structured arrays (molecules: compressed_cb/
    compressed_ub/p_group_misaligned; snp_calls: molecule_index/
    snp_position/base_index/p_base_wrong), by design — the dtype layout is
    part of this framework's parity surface.
    """
    from demuxalot.snp_counter import CompressedSNPCalls as RefCalls

    converted = {}
    for chromosome, calls in chromosome2compressed_snp_calls.items():
        ref_calls = RefCalls()
        ref_calls.molecules = calls.molecules.copy()
        ref_calls.snp_calls = calls.snp_calls.copy()
        ref_calls.n_molecules = calls.n_molecules
        ref_calls.n_snp_calls = calls.n_snp_calls
        converted[chromosome] = ref_calls
    return converted


def reference_staged_losses(
    reference, calls, genotypes, barcodes, n_iterations, compute_loss, tmp_path,
    doublet_prior=0.0,
):
    """Per-iteration losses of the reference EM on converted inputs."""
    ref_genotypes = to_reference_genotypes(reference, genotypes, tmp_path)
    ref_calls = to_reference_calls(reference, calls)
    ref_handler = reference.BarcodeHandler(list(barcodes))
    losses = []
    for probs_df, _debug in reference.Demultiplexer.staged_genotype_learning(
        ref_calls, ref_genotypes, ref_handler,
        n_iterations=n_iterations, doublet_prior=doublet_prior,
    ):
        losses.append(round(float(compute_loss(probs_df)), 4))
    return losses
