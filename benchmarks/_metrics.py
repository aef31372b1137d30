"""Shared truth-quality metrics for the benchmark harnesses (no side effects).

``truth`` is a list aligned with the posterior dataframe's rows; each entry
is the barcode's sorted, de-duplicated true donor names (1 = singlet,
2 = doublet).
"""
import numpy as np


def singlet_loss(probs_df, truth):
    """Mean -log P(true donors) over singlet genotype columns (ref metric)."""
    values = probs_df.values
    cols = {name: j for j, name in enumerate(probs_df.columns)}
    p = np.zeros(len(truth))
    for b, donors in enumerate(truth):
        for d in donors:
            p[b] += values[b, cols[d]]
    return float(-np.log(np.clip(p, 1e-4, None)).mean())


def joint_loss(probs_df, truth):
    """Mean -log P(exact truth column): 'A+B' for doublets, donor for singlets.

    The right loss for doublet-aware posteriors (doublet_prior > 0), where
    a doublet barcode's mass correctly sits on its pair column and the
    singlet-column metric would penalize the model for being right.
    """
    values = probs_df.values
    cols = {name: j for j, name in enumerate(probs_df.columns)}
    p = np.zeros(len(truth))
    for b, donors in enumerate(truth):
        p[b] = values[b, cols["+".join(donors)]]
    return float(-np.log(np.clip(p, 1e-4, None)).mean())


def doublet_metrics(probs_df, truth):
    """Argmax assignment accuracy split by singlet/doublet truth."""
    assignments = [probs_df.columns[j] for j in np.argmax(probs_df.values, axis=1)]
    singlet_ok = doublet_ok = n_singlet = n_doublet = 0
    for called, donors in zip(assignments, truth):
        called_set = sorted(called.split("+"))
        if len(donors) == 1:
            n_singlet += 1
            singlet_ok += called_set == donors
        else:
            n_doublet += 1
            doublet_ok += called_set == donors
    return {
        "singlet_accuracy": round(singlet_ok / max(n_singlet, 1), 4),
        "doublet_exact_accuracy": round(doublet_ok / max(n_doublet, 1), 4),
        "n_singlets": n_singlet,
        "n_doublets": n_doublet,
    }
