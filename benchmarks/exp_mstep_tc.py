"""Sweep the M-step chunk size: per-chunk loop overhead vs padding cost.

exp_mstep_decompose measured the bench-shape M-step kernel at +4.43 ms
over its gather with 8701 chunks of tc=512 — ~509 ns/chunk, an order of
magnitude above the chunk's DMA bytes. If that is per-chunk control/DMA
bookkeeping, larger chunks trade padded slots (gather rows) for fewer
loop iterations; this sweep finds the knee.

Usage: python benchmarks/exp_mstep_tc.py [n_barcodes n_snps calls_per_barcode]
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
    rng = np.random.default_rng(0)
    post = jnp.asarray(rng.random((N_B, N_D + N_D * (N_D - 1) // 2), np.float32))

    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))

    for tc in (256, 512, 1024, 2048):
        mlayout = TiledMstepCalls(
            vid[vorder], cb[vorder], q[vorder], n_variants,
            chunk_calls=tc, n_barcodes=N_B,
            n_bands=choose_mstep_bands(N_B, N_D), n_genotypes=N_D,
        )
        m_ops = tuple(jnp.asarray(x) for x in (
            mlayout.cb_global, mlayout.vl, mlayout.q,
            mlayout.chunk_bounds, mlayout.chunk_suboff))
        slots = mlayout.n_chunks * mlayout.chunk_calls

        def full(posterior, a, ml=mlayout):
            return jnp.sum(tiled_mstep_impl(
                posterior, *a[:5], n_variants=n_variants, n_genotypes=N_D,
                tv=ml.tile_variants, tc=ml.chunk_calls,
                sps=ml.subtiles_per_super, contribution_power=2.0,
                band_specs=ml.band_specs)) * 1e-30

        chain = jax.jit(lambda c, a: jax.lax.fori_loop(
            0, K, lambda i, c: full(a[5] + c, a), c))
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
        print(
            f"tc={tc:5d} chunks={mlayout.n_chunks:6d} "
            f"pad={slots / len(vid) - 1:6.2%} full={ms:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
