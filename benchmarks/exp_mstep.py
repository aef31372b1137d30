"""M-step timing at a given shape (chain-amortized) — standalone M-step timing.

Usage: python benchmarks/exp_mstep.py [n_barcodes n_snps calls_per_barcode]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
N_S = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
CPB = int(sys.argv[3]) if len(sys.argv) > 3 else 64
N_D = 32
K = 10


def main():
    from demuxalot_tpu.ops import likelihood as L
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

    def mstep(posterior, a):
        return tiled_mstep_impl(
            posterior, *a, n_variants=n_variants, n_genotypes=N_D,
            tv=mlayout.tile_variants, tc=mlayout.chunk_calls,
            sps=mlayout.subtiles_per_super, contribution_power=2.0,
            band_specs=mlayout.band_specs)

    rng = np.random.default_rng(0)
    post = jnp.asarray(rng.random((N_B, N_D + N_D * (N_D - 1) // 2), np.float32))

    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))
    chain = jax.jit(lambda c, a: jax.lax.fori_loop(
        0, K, lambda i, c: jnp.sum(mstep(a[0] + c, a[1])) * 1e-30, c))
    float(jnp.sum(chain(jnp.float32(0.0), (post, m_ops))))
    lat = min((lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(chain(jnp.float32(0.0), (post, m_ops))))
        best = min(best, time.perf_counter() - t0)
    print(f"mstep B={N_B} calls={len(vid)}: {max(best-lat,0)/K*1e3:.2f} ms "
          f"(tv={mlayout.tile_variants} tc={mlayout.chunk_calls} "
          f"chunks={mlayout.n_chunks})", flush=True)


if __name__ == "__main__":
    main()
