"""Fused Pallas TPU kernel for the likelihood accumulation (placeholder).

Will fuse gather → doublet-expansion matmul → log → barcode segment-sum in
VMEM; until the kernel lands this delegates to the XLA path so the
``use_pallas`` toggle is safe everywhere.
"""
from __future__ import annotations

from . import likelihood as L


def barcode_logits_pallas(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes):
    return L.barcode_logits(genotype_prob, mixing, penalties, variant_id, cb, q, n_barcodes)
