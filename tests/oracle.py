"""Pure-numpy oracle mirroring the reference's likelihood/EM math.

Written directly from the published algorithm (demuxalot/demux.py:158-274):
per-pseudogenotype loops with float64 bincount accumulation. Used only as a
test oracle to validate the vectorized JAX/Pallas paths.
"""
import numpy as np


def oracle_doublet_penalties(n_genotypes, doublet_prior):
    assert 0 <= doublet_prior < 1
    if doublet_prior == 0:
        return np.zeros(n_genotypes, dtype="float32")
    bonus = np.log(n_genotypes * doublet_prior)
    bonus -= np.log(n_genotypes * max(n_genotypes - 1, 1) / 2 * (1 - doublet_prior))
    n_options = n_genotypes * (n_genotypes + 1) // 2
    out = np.zeros(n_options, dtype="float32")
    out[n_genotypes:] = bonus
    return out


def oracle_probs_from_betas(variant2snp, betas, p_clip):
    probs = np.zeros(betas.shape, dtype="float32")
    for g in range(betas.shape[1]):
        denom = np.bincount(variant2snp, weights=betas[:, g])[variant2snp]
        probs[:, g] = betas[:, g] / denom.clip(1e-7)
    return probs.clip(p_clip, 1 - p_clip)


def iterate_pseudogenotypes(genotype_names, genotype_prob, doublet_prior):
    idx = 0
    for g, name in enumerate(genotype_names):
        yield idx, name, genotype_prob[:, g]
        idx += 1
    if doublet_prior != 0:
        for i, g1 in enumerate(genotype_names):
            for j, g2 in enumerate(genotype_names):
                if i < j:
                    yield idx, f"{g1}+{g2}", (genotype_prob[:, i] + genotype_prob[:, j]) * 0.5
                    idx += 1


def oracle_barcode_logits(genotype_names, genotype_prob, vid, cb, q, n_barcodes, doublet_prior):
    penalties = oracle_doublet_penalties(len(genotype_names), doublet_prior)
    logits = np.zeros([n_barcodes, 1], dtype="float32") + penalties
    names = []
    for pg, name, variant2prob in iterate_pseudogenotypes(genotype_names, genotype_prob, doublet_prior):
        names.append(name)
        p = variant2prob[vid]
        log_penalties = np.log(p * (1 - q) + q.clip(1e-4))
        logits[:, pg] = logits[:, pg] + np.bincount(cb, weights=log_penalties, minlength=n_barcodes)
    return logits, names


def oracle_mstep(posterior_probs, vid, cb, q, n_variants, n_genotypes, power):
    addition = np.zeros([n_variants, n_genotypes], dtype="float32")
    for g in range(n_genotypes):
        contribution = posterior_probs[cb, g] * (1 - q)
        contribution = contribution**power
        addition[:, g] = addition[:, g] + np.bincount(vid, weights=contribution, minlength=n_variants)
    return addition


def oracle_barcode_calls(vid, snp_id, cb, q):
    """Brute-force collapse of molecule calls to (variant, snp, barcode) rows."""
    groups = {}
    for v, s, b, qq in zip(vid, snp_id, cb, q):
        key = (int(v), int(s), int(b))
        groups.setdefault(key, []).append(float(qq))
    rows = sorted(groups)
    out_p = np.array([np.prod(np.asarray(groups[k], dtype="float32")) for k in rows], dtype="float32")
    out = {
        "variant_id": np.array([k[0] for k in rows], dtype="int32"),
        "snp_id": np.array([k[1] for k in rows], dtype="int32"),
        "compressed_cb": np.array([k[2] for k in rows], dtype="int32"),
        "p_base_wrong": out_p,
        "count": np.array([len(groups[k]) for k in rows]),
    }
    return out


def oracle_snp_aggregated_logits(
    genotype_prob, mixing, variant_id, q, compressed_cb, snp_id, n_barcodes,
    compensation=0.5, p_bad_snp=0.01,
):
    """Reference math for the per-SNP aggregation path (ref demux.py:193-244)."""
    from scipy.special import log_softmax

    n_pg = mixing.shape[1]
    key = compressed_cb.astype(np.int64) * (snp_id.max() + 1) + snp_id
    uniq, inverse, counts = np.unique(key, return_inverse=True, return_counts=True)
    group_barcode = (uniq // (snp_id.max() + 1)).astype(np.int64)

    p = genotype_prob[variant_id] @ mixing
    vals = np.log(p + q[:, None])
    group_logits = np.zeros([len(uniq), n_pg])
    np.add.at(group_logits, inverse, vals)
    group_logits = group_logits / counts[:, None] ** compensation
    group_logits = log_softmax(group_logits, axis=1)
    group_logits = np.logaddexp(group_logits, np.log(p_bad_snp / n_pg))
    group_logits = log_softmax(group_logits, axis=1)

    out = np.zeros([n_barcodes, n_pg])
    np.add.at(out, group_barcode, group_logits)
    return out.astype(np.float32)
