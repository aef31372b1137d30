"""Benchmark: likelihood-kernel throughput on the local accelerator.

Headline metric: barcode×SNP×genotype likelihood evaluations per second on
one chip — one evaluation is one (call, pseudo-genotype) term
log(p·(1−q) + q̃) accumulated into a barcode logit, the hot loop of the
reference implementation (demuxalot/demux.py:256-263). The baseline is the
reference's numpy compute style (per-pseudogenotype gather + log + bincount)
measured single-threaded on this host, at 32 donors → 528 pseudo-genotypes.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

N_DONORS = 32
N_SNPS = 65_536
N_BARCODES = 65_536
CALLS_PER_BARCODE = 64  # ~4.2M calls
DOUBLET_PRIOR = 0.35


def _numpy_reference_logits(genotype_prob, vid, cb, q, n_barcodes, n_donors, doublet_prior):
    """Per-pseudogenotype loop exactly in the reference's compute style."""
    import math

    n_pairs = n_donors * (n_donors - 1) // 2
    n_pg = n_donors + (n_pairs if doublet_prior else 0)
    logits = np.zeros([n_barcodes, n_pg], dtype="float32")
    cols = []
    for g in range(n_donors):
        cols.append(genotype_prob[:, g])
    if doublet_prior:
        for i in range(n_donors):
            for j in range(i + 1, n_donors):
                cols.append((genotype_prob[:, i] + genotype_prob[:, j]) * 0.5)
    for pg, variant2prob in enumerate(cols):
        p = variant2prob[vid]
        log_penalties = np.log(p * (1 - q) + q.clip(1e-4))
        logits[:, pg] += np.bincount(cb, weights=log_penalties, minlength=n_barcodes).astype("float32")
    return logits


def main():
    import jax
    import jax.numpy as jnp

    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.sim import synthesize_device_workload

    backend = jax.default_backend()
    betas, variant2snp, vid, cb, q, _truth = synthesize_device_workload(
        N_BARCODES, N_DONORS, N_SNPS, CALLS_PER_BARCODE, seed=0
    )
    names = [f"D{i:02}" for i in range(N_DONORS)]
    mixing, _ = L.pseudogenotype_mixing(names, DOUBLET_PRIOR)
    penalties = L.doublet_penalties(N_DONORS, DOUBLET_PRIOR)
    n_pg = mixing.shape[1]
    n_calls = len(vid)

    # --- device path -------------------------------------------------------
    from functools import partial

    @partial(jax.jit, static_argnames=("n_snps", "n_barcodes", "call_chunk"))
    def forward(betas, v2s, mixing, penalties, vid, cb, q, *, n_snps, n_barcodes, call_chunk):
        gp = L.probs_from_betas(betas, v2s, n_snps, 0.01)
        return L.barcode_logits(gp, mixing, penalties, vid, cb, q, n_barcodes, call_chunk=call_chunk)

    args = [jnp.asarray(x) for x in (betas, variant2snp, mixing, penalties, vid, cb, q)]
    run = lambda: forward(
        *args, n_snps=N_SNPS, n_barcodes=N_BARCODES, call_chunk=512 * 1024
    ).block_until_ready()

    run()  # compile
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    device_time = (time.perf_counter() - t0) / n_iters
    device_rate = n_calls * n_pg / device_time

    # --- numpy baseline (reference compute style), subsampled --------------
    sub = min(n_calls, 200_000)
    gp_np = np.asarray(L.probs_from_betas(args[0], args[1], N_SNPS, 0.01))
    t0 = time.perf_counter()
    _numpy_reference_logits(gp_np, vid[:sub], cb[:sub], q[:sub], N_BARCODES, N_DONORS, DOUBLET_PRIOR)
    baseline_time = time.perf_counter() - t0
    baseline_rate = sub * n_pg / baseline_time

    result = {
        "metric": "likelihood_evals_per_s_per_chip",
        "value": round(device_rate, 1),
        "unit": "call*pseudogenotype evals/s",
        "vs_baseline": round(device_rate / baseline_rate, 2),
        "backend": backend,
        "config": {
            "n_donors": N_DONORS,
            "n_pseudogenotypes": n_pg,
            "n_barcodes": N_BARCODES,
            "n_calls": n_calls,
            "n_snps": N_SNPS,
            "device_time_s": round(device_time, 4),
            "baseline_numpy_evals_per_s": round(baseline_rate, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
