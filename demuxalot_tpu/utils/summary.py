"""Diagnostics: per-chromosome counting summaries and quality metrics.

Host-side helpers mirroring the reference's diagnostics surface
(demuxalot/utils.py:163-204 and 265-296).
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List

import numpy as np
import pandas as pd


def summarize_counted_SNPs(snp_counts: Dict[str, "CompressedSNPCalls"], show_plot: bool = True):
    """Per-chromosome molecule/call counts plus per-droplet histograms.

    Returns a dataframe indexed by chromosome; optionally draws matplotlib
    histograms of calls/transcripts per droplet (reference:
    demuxalot/utils.py:163-204).
    """
    records = []
    barcode2number_of_calls = Counter()
    barcode2number_of_transcripts = Counter()

    for chromosome, calls in snp_counts.items():
        records.append(
            dict(
                chromosome=chromosome,
                n_molecules=calls.n_molecules,
                n_snp_calls=calls.n_snp_calls,
            )
        )
        barcode2number_of_transcripts.update(Counter(calls.molecules["compressed_cb"]))
        barcodes = calls.molecules["compressed_cb"][calls.snp_calls["molecule_index"]]
        barcode2number_of_calls.update(Counter(barcodes))

    if show_plot:
        from matplotlib import pyplot as plt

        fig, (ax1, ax2) = plt.subplots(ncols=2, figsize=[12, 5])

        def truncate_at_perc(x, percentile=99.5):
            x = np.asarray(list(x))
            return x.clip(0, np.percentile(x, percentile))

        ax1.hist(truncate_at_perc(barcode2number_of_calls.values()), histtype="step", bins=20)
        ax1.set_ylabel("barcodes")
        ax1.set_xlabel("SNP calls per droplet")

        ax2.hist(truncate_at_perc(barcode2number_of_transcripts.values()), histtype="step", bins=20)
        ax2.set_ylabel("number of barcodes")
        ax2.set_xlabel("transcripts per droplet")
        fig.show()

    return pd.DataFrame(records).sort_values("chromosome").set_index("chromosome")


def compute_qualities(probs: pd.DataFrame, barcode2possible_donors: dict):
    """Accuracy / logloss against a set of known-possible donors per barcode.

    ``probs`` has barcodes as index and all singlet+doublet genotype names as
    columns; each barcode maps to the list of acceptable column names
    (reference: demuxalot/utils.py:265-296).
    """
    assert probs.index.isin(barcode2possible_donors).all(), "probs index barcodes should be in the dict"
    assert np.allclose(probs.sum(axis=1), 1, atol=1e-2), "probabilities should sum to one for each barcode"

    donors_in_columns = set(probs.columns)
    for _, donors in barcode2possible_donors.items():
        assert all(d in donors_in_columns for d in donors), f"some of donors not found in probabilities: {donors}"

    loglosses = []
    is_correct = []

    for barcode, sample_probs in probs.iterrows():
        possible_donors: List[str] = barcode2possible_donors[barcode]
        prob = sample_probs[possible_donors].sum()
        loglosses.append(-np.log(max(prob, 1e-4)))
        is_correct.append(sample_probs.idxmax() in possible_donors)

    return {
        "logloss": float(np.mean(loglosses)),
        "accuracy": float(np.mean(is_correct)),
        "error rate": 1 - float(np.mean(is_correct)),
    }


# private alias kept for parity with the reference's name
_compute_qualities = compute_qualities
