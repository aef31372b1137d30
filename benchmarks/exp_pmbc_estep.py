"""E-step config sweep at PMBC scale: tile shape x stacked-K expansion.

Chain-timed (k dependent iterations in one jit) — single-shot timings
through this TPU tunnel read optimistic. Prints ms per E-step and the
max rel error of each variant vs the first.
"""
import functools
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
K = 6


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl
    from demuxalot_tpu.models.demux import _PallasLogits
    from demuxalot_tpu.sim import synthesize_device_workload

    assert jax.default_backend() == "tpu"
    betas, v2s, vid, cb, q, _ = synthesize_device_workload(N_B, N_D, N_S, CPB, seed=0)
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_D)], 0.35)
    pen = L.doublet_penalties(N_D, 0.35)
    pg = mixing.shape[1]
    gp = jax.jit(L.probs_from_betas, static_argnums=(2, 3))(
        jnp.asarray(betas), jnp.asarray(v2s), N_S, 0.01)
    float(jnp.sum(gp))
    rec = np.recarray(len(vid), dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = v2s[vid]

    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))

    def lat():
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(small))
            best = min(best, time.perf_counter() - t0)
        return best

    ref = None
    for tb, tc in [(64, 1024), (32, 512)]:
        dev = _PallasLogits(rec, N_B, mixing, pen, tb, tc, n_variants=betas.shape[0]).device
        ops = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
               dev.chunk_bounds, dev.chunk_suboff)
        for stack in (True, False):
            fn = functools.partial(
                tiled_logits_impl,
                n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
                tc=dev.chunk_calls, band_specs=dev.band_specs, stack_k=stack,
            )

            def step(c, a):
                gp_a, rest = a[0], a[1:]
                return jnp.sum(fn(gp_a + c, *rest)[:N_B, :pg]) * 1e-30

            chain = jax.jit(lambda c, a: jax.lax.fori_loop(
                0, K, lambda i, c: step(c, a), c))
            out = np.asarray(fn(gp, *ops)[:N_B, :pg])
            if ref is None:
                ref = out
            err = np.max(np.abs(out - ref) / (1 + np.abs(ref)))
            float(jnp.sum(chain(jnp.float32(0.0), (gp, *ops))))
            latency = lat()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(chain(jnp.float32(0.0), (gp, *ops))))
                best = min(best, time.perf_counter() - t0)
            ms = max(best - latency, 0) / K * 1e3
            print(f"tb={tb} tc={tc} stack_k={int(stack)}: {ms:8.2f} ms  relerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
