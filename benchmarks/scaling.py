"""Weak-scaling harness: EM iteration throughput vs mesh size.

Per-shard problem size stays constant (weak scaling); the efficiency at N
devices is throughput(N) / (N * throughput(1)). The only collective per
iteration is the psum of the M-step partials, so efficiency should stay
near 1.0 on ICI-connected slices.

Run on real hardware when multiple chips/hosts are available:
    python benchmarks/scaling.py
On a CPU host it exercises the virtual 8-device mesh (validates the
harness, not a hardware measurement).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

BARCODES_PER_SHARD = 8192
N_DONORS = 16
N_SNPS = 16384
CALLS_PER_BARCODE = 32
DOUBLET_PRIOR = 0.0  # EM default


def measure_em(mesh_devices, n_barcodes):
    import jax
    import jax.numpy as jnp

    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops import packing as P
    from demuxalot_tpu.parallel.mesh import make_mesh
    from demuxalot_tpu.parallel.sharded import (
        ShardedDemultiplexer, _build_mstep, _build_mstep_pallas,
    )
    from demuxalot_tpu.sim import synthesize_device_workload

    betas, v2s, vid, cb, q, _ = synthesize_device_workload(
        n_barcodes, N_DONORS, N_SNPS, CALLS_PER_BARCODE, seed=0
    )
    mixing, _names = L.pseudogenotype_mixing(
        [f"D{i:02}" for i in range(N_DONORS)], DOUBLET_PRIOR
    )
    pen = L.doublet_penalties(N_DONORS, DOUBLET_PRIOR)
    n_variants, n_genotypes = betas.shape

    sh = ShardedDemultiplexer(make_mesh(mesh_devices))
    rec = np.recarray(len(vid), dtype=P.BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = v2s[vid]
    rec["barcode_variant_count"] = 1
    rec["barcode_snp_count"] = 1

    device, arrays, tiled = sh._shard_inputs(
        rec, n_barcodes, mixing, pen, n_variants=n_variants
    )
    betas_r, v2s_r, mix_r, pen_r = sh._replicate(betas, v2s, mixing, pen)
    estep, eargs = sh._make_estep(
        device, arrays, tiled, N_SNPS, 0.01, mixing.shape[1], mix_r, pen_r
    )
    if "mstep_layout" in arrays:
        mstep = jax.jit(_build_mstep_pallas(
            sh.mesh, arrays["mstep_layout"], n_variants, n_genotypes, 2.0
        ))
        margs = (arrays["mstep_cb"], arrays["mstep_vl"], arrays["mstep_q"], arrays["mstep_bounds"])
    else:
        mstep = jax.jit(_build_mstep(sh.mesh, n_variants, n_genotypes, 2.0, sh.call_chunk))
        margs = (arrays["vid_v"], arrays["cb_v"], arrays["q_v"])

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.0000001

    small = jnp.ones((8,))

    def em_iter(addition):
        _logits, probs = estep(betas_r + addition, v2s_r, *eargs)
        return mstep(probs, *margs)

    add = em_iter(sh._replicate(np.zeros_like(betas))[0])
    float(jnp.sum(add))  # force

    lat = min(
        (lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        add = em_iter(add)
        float(jnp.sum(add))
        times.append(time.perf_counter() - t0)
    em_time = max(min(times) - lat, 1e-9)
    return em_time, n_barcodes / em_time


def main():
    import jax

    devices = jax.devices()
    results = []
    sizes = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
    if len(devices) >= 4:
        sizes = sorted(set(sizes) | {4})
    for n in sizes:
        n_barcodes = BARCODES_PER_SHARD * n
        em_time, rate = measure_em(devices[:n], n_barcodes)
        results.append({"devices": n, "n_barcodes": n_barcodes,
                        "em_iteration_s": round(em_time, 4),
                        "barcodes_per_s": round(rate, 1)})
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["barcodes_per_s"]
    for r in results:
        r["weak_scaling_efficiency"] = round(r["barcodes_per_s"] / (base * r["devices"]), 3)
    print(json.dumps({"backend": jax.default_backend(), "weak_scaling": results}))


if __name__ == "__main__":
    main()
