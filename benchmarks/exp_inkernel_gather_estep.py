"""A/B: in-kernel-gather E-step vs the mainline pre-gathered kernel.

The mainline E-step pays the XLA gather engine's ~2.6 ns/row floor
(~10.6 ms at the bench shape) before the kernel even starts. The
experimental variant (DEMUX kernels `_likelihood_kernel_ig`) keeps each
variant band's genotype rows resident in VMEM and gathers with jnp.take
inside the kernel — on-core and overlapped with the MXU work. Run AFTER
exp_kernel_gather.py's canary proves the take lowers at all.

Interpret-mode equality: tests/test_pallas_kernel.py::
test_inkernel_gather_matches_mainline.
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
DOUBLET_PRIOR = 0.35
# VMEM-sized variant bands for the resident table: ~1.4 MB per band block
N_BANDS = 12
TILE_BARCODES = 64


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, tiled_logits_impl
    from demuxalot_tpu.ops.tiling import choose_banded_chunk_calls, tile_barcode_calls_banded
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
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_DONORS)], DOUBLET_PRIOR)
    pen = L.doublet_penalties(N_DONORS, DOUBLET_PRIOR)

    order = np.argsort(cb, kind="stable")
    n_tiles = -(-N_BARCODES // TILE_BARCODES)
    tc = choose_banded_chunk_calls(len(cb), n_tiles, N_BANDS, 1024, seg_rows=TILE_BARCODES)
    tiled = tile_barcode_calls_banded(
        cb[order].astype(np.int32), vid[order].astype(np.int32),
        q[order].astype(np.float32), N_BARCODES,
        n_variants=n_variants, n_bands=N_BANDS,
        tile_barcodes=TILE_BARCODES, chunk_calls=tc,
    )
    dev = TiledDeviceCalls(mixing, pen, tiled)
    print(f"# layout: tc={tc} n_chunks={dev.n_chunks} n_super={dev.n_super} "
          f"grid={dev.n_super * N_BANDS}")
    gp = L.probs_from_betas(jnp.asarray(betas), jnp.asarray(v2s), N_SNPS, 0.01)
    args = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
            dev.chunk_bounds, dev.chunk_suboff)
    common = dict(n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
                  tc=dev.chunk_calls, band_specs=dev.band_specs)

    def mainline(c, a):
        g, o = a
        out = tiled_logits_impl(g + c, *o, **common)
        return jnp.sum(out) * 1e-30

    def inkernel(c, a):
        from inkernel_gather_kernels import tiled_logits_inkernel_gather

        g, o = a
        out = tiled_logits_inkernel_gather(g + c, *o, **common)
        return jnp.sum(out) * 1e-30

    t_main = chain_time(mainline, (gp, args))
    print(f"mainline (same {N_BANDS}-band layout): {t_main*1e3:.2f} ms")
    t_ig = chain_time(inkernel, (gp, args))
    print(f"in-kernel gather:                      {t_ig*1e3:.2f} ms ({(t_main-t_ig)*1e3:+.2f} ms)")


if __name__ == "__main__":
    main()
