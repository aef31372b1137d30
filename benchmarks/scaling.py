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

# default shard size matches a realistic per-chip serving slice; small
# shards under-amortize fixed dispatch overhead and understate efficiency
BARCODES_PER_SHARD = int(os.environ.get("DEMUX_SCALING_BARCODES_PER_SHARD", 32768))
N_DONORS = int(os.environ.get("DEMUX_SCALING_DONORS", 16))
N_SNPS = int(os.environ.get("DEMUX_SCALING_SNPS", 16384))
CALLS_PER_BARCODE = int(os.environ.get("DEMUX_SCALING_CALLS_PER_BARCODE", 32))
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
        margs = (arrays["mstep_cb"], arrays["mstep_vl"], arrays["mstep_q"],
                 arrays["mstep_bounds"], arrays["mstep_suboff"])
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


def _run_one(n: int):
    """Measure one mesh size in-process and print its result JSON."""
    import jax

    devices = jax.devices()[:n]
    n_barcodes = BARCODES_PER_SHARD * n
    em_time, rate = measure_em(devices, n_barcodes)
    print(json.dumps({"devices": n, "n_barcodes": n_barcodes,
                      "em_iteration_s": round(em_time, 4),
                      "barcodes_per_s": round(rate, 1)}), flush=True)


def _measure_subprocess(n: int, n_cores: int):
    """Run one mesh size in a child pinned to ``n_cores`` physical cores.

    On a CPU host the 1-device XLA run already spreads across every core, so
    in-process weak scaling conflates core oversubscription with collective
    overhead. Pinning the n-device measurement to n cores emulates "each
    device owns equal hardware", which is the quantity weak scaling is
    supposed to track (a real TPU slice gives every chip its own silicon).
    """
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    cores = ",".join(str(c) for c in range(n_cores))
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, __file__, "--one", str(n)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"scaling child (n={n}) failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    import jax

    backend = jax.default_backend()
    n_devices = len(jax.devices())
    # CPU children spawn their own virtual device meshes, so the parent's
    # visible device count does not cap the sweep there
    sizes = [1, 2, 4, 8] if backend == "cpu" else [
        n for n in (1, 2, 4, 8) if n <= n_devices
    ]
    results = []
    host_cores = os.cpu_count() or 1
    # this is a shared VM: repeat each point and keep the fastest child run
    # (min-of-repeats, same discipline as every timing harness in this repo)
    repeats = int(os.environ.get("DEMUX_SCALING_REPEATS", 3))
    for n in sizes:
        if backend == "cpu":
            runs = [_measure_subprocess(n, min(n, host_cores)) for _ in range(repeats)]
            r = min(runs, key=lambda x: x["em_iteration_s"])
        else:
            n_barcodes = BARCODES_PER_SHARD * n
            em_time, rate = measure_em(jax.devices()[:n], n_barcodes)
            r = {"devices": n, "n_barcodes": n_barcodes,
                 "em_iteration_s": round(em_time, 4),
                 "barcodes_per_s": round(rate, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    base = results[0]["barcodes_per_s"]
    for r in results:
        r["weak_scaling_efficiency"] = round(r["barcodes_per_s"] / (base * r["devices"]), 3)
    out = {"backend": backend, "weak_scaling": results}
    if backend == "cpu":
        out["method"] = (
            f"each N-device point runs in a child process pinned to min(N, {host_cores}) "
            "host cores so every virtual device owns equal hardware; points with "
            f"N > {host_cores} devices oversubscribe the host and understate efficiency"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        _run_one(int(sys.argv[2]))
    else:
        main()
