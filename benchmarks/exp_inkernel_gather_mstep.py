"""A/B: in-kernel posterior-gather M-step vs the mainline pre-gathered one.

The mainline M-step's dominant cost at the bench shape is the XLA gather
of a posterior row per call (~10.9 ms floor at 4.2M calls). The
experimental kernel (_mstep_kernel_ig) banded on BARCODES keeps each
band's posterior^p rows VMEM-resident and gathers with jnp.take in-kernel.
Run AFTER exp_kernel_gather.py's canary.

Interpret-mode equality: tests/test_pallas_kernel.py::
test_mstep_inkernel_gather_matches_oracle.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from _timing import chain_time

N_DONORS, N_SNPS, N_BARCODES, CPB = 32, 65_536, 65_536, 64
N_BANDS = 8  # 8192-barcode posterior band blocks (~1 MB at 32 donors)


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls, tiled_mstep_impl
    from demuxalot_tpu.sim import synthesize_device_workload

    backend = jax.default_backend()
    print(f"# backend: {backend}")
    if backend != "tpu":
        print("TPU required; exiting")
        return

    betas, v2s, vid, cb, q, _ = synthesize_device_workload(
        N_BARCODES, N_DONORS, N_SNPS, CPB, seed=0
    )
    n_variants = betas.shape[0]
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_DONORS)], 0.35)
    n_pg = mixing.shape[1]
    rng = np.random.RandomState(0)
    post = rng.rand(N_BARCODES, n_pg).astype(np.float32)
    post /= post.sum(axis=1, keepdims=True)
    post_dev = jnp.asarray(post)

    vorder = np.argsort(vid, kind="stable")

    def build(n_bands):
        return TiledMstepCalls(
            vid[vorder].astype(np.int32), cb[vorder].astype(np.int32),
            q[vorder].astype(np.float32), n_variants,
            n_barcodes=N_BARCODES, n_bands=n_bands, n_genotypes=N_DONORS,
        )

    def run(layout, label, inkernel):
        dev = tuple(jnp.asarray(x) for x in (
            layout.cb_global, layout.vl, layout.q,
            layout.chunk_bounds, layout.chunk_suboff,
        ))

        def step(c, a):
            p, d_ = a
            kw = dict(
                n_variants=n_variants, n_genotypes=N_DONORS,
                tv=layout.tile_variants, tc=layout.chunk_calls,
                sps=layout.subtiles_per_super, contribution_power=2.0,
                band_specs=layout.band_specs,
            )
            if inkernel:
                from inkernel_gather_kernels import tiled_mstep_inkernel_gather

                out = tiled_mstep_inkernel_gather(p + c, *d_, **kw)
            else:
                out = tiled_mstep_impl(p + c, *d_, **kw)
            return jnp.sum(out) * 1e-30

        t = chain_time(step, (post_dev, dev), k=12)
        print(f"{label}: {t*1e3:.2f} ms "
              f"(tc={layout.chunk_calls} n_chunks={layout.n_chunks} "
              f"grid={layout.n_super * max(1, len(layout.band_specs))})")
        return t

    t_main = run(build(1), "mainline (unbanded)          ", False)
    t_ig = run(build(N_BANDS), f"in-kernel gather ({N_BANDS} bands)", True)
    print(f"delta: {(t_main - t_ig)*1e3:+.2f} ms")


if __name__ == "__main__":
    main()
