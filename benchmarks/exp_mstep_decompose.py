"""Decompose the M-step cost: posterior gather vs kernel (chain-amortized).

Times, at one shape:
  gather       wt = posterior[:, :D].T[:, cb_global] materialized to HBM
  full M-step  gather + Pallas scatter kernel
and prints the layout's padding statistics (padded slots per real call).

Usage: python benchmarks/exp_mstep_decompose.py [n_barcodes n_snps calls_per_barcode]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
N_S = int(sys.argv[2]) if len(sys.argv) > 2 else 327680
CPB = int(sys.argv[3]) if len(sys.argv) > 3 else 72
N_D = 32
K = 8


def main():
    from demuxalot_tpu.ops.pallas_mstep import (
        TiledMstepCalls, choose_mstep_bands, tiled_mstep_impl,
    )
    from demuxalot_tpu.sim import synthesize_device_workload

    assert jax.default_backend() == "tpu"
    betas, v2s, vid, cb, q, _ = synthesize_device_workload(N_B, N_D, N_S, CPB, seed=0)
    n_variants = betas.shape[0]
    vorder = np.argsort(vid, kind="stable")
    mlayout = TiledMstepCalls(
        vid[vorder], cb[vorder], q[vorder], n_variants,
        n_barcodes=N_B, n_bands=choose_mstep_bands(N_B, N_D), n_genotypes=N_D,
    )
    m_ops = tuple(jnp.asarray(x) for x in (
        mlayout.cb_global, mlayout.vl, mlayout.q,
        mlayout.chunk_bounds, mlayout.chunk_suboff))
    slots = mlayout.n_chunks * mlayout.chunk_calls
    print(
        f"layout: calls={len(vid)} slots={slots} pad={slots / len(vid) - 1:.2%} "
        f"tv={mlayout.tile_variants} tc={mlayout.chunk_calls} "
        f"chunks={mlayout.n_chunks} sps={mlayout.subtiles_per_super} "
        f"n_super={mlayout.n_super} bands={max(1, len(mlayout.band_specs))}",
        flush=True,
    )

    def gather_only(posterior, a):
        cb_global = a[0]
        return jnp.sum(posterior[:, :N_D].T[:, cb_global]) * 1e-30

    def full(posterior, a):
        return jnp.sum(tiled_mstep_impl(
            posterior, *a[:5], n_variants=n_variants, n_genotypes=N_D,
            tv=mlayout.tile_variants, tc=mlayout.chunk_calls,
            sps=mlayout.subtiles_per_super, contribution_power=2.0,
            band_specs=mlayout.band_specs)) * 1e-30

    rng = np.random.default_rng(0)
    post = jnp.asarray(rng.random((N_B, N_D + N_D * (N_D - 1) // 2), np.float32))

    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))
    prev = 0.0
    for name, step in [("gather", gather_only), ("full M-step", full)]:
        chain = jax.jit(lambda c, a, s=step: jax.lax.fori_loop(
            0, K, lambda i, c: s(a[5] + c, a), c))
        args = m_ops + (post,)
        float(jnp.sum(chain(jnp.float32(0.0), args)))
        lat = min((lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(5))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(chain(jnp.float32(0.0), args)))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - lat, 0) / K * 1e3
        print(f"{name:12s} {ms:8.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
