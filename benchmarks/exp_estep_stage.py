"""E-step staged-DMA A/B: DEMUX_STAGE_COLS sweep at the bench shape.

Hypothesis (round-4 bound accounting): the E-step kernel side is bound by
the u-stream DMA at the engine's issue-limited rate — per
exp_dma_pattern.py, [32, 512]-column transfers (~64 KB, the default
sb = 1 double buffer at tc = 512) stream at ~120 GB/s vs ~234 GB/s for
~1 MB blocks. The bench-shape u stream is ~570 MB per E-step, so staging
SB chunks per transfer should move the kernel from ~4.7 ms of DMA toward
~2.4 ms — IF the per-chunk compute (~3.7 ms total) doesn't already hide
it. (The M-step A/B measured staging negative; its compute/DMA balance
differs.)

Run once per STAGE_COLS value (the knob is read at import):

    for s in 128 2048 4096; do DEMUX_STAGE_COLS=$s python benchmarks/exp_estep_stage.py; done
"""
import os
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


def main():
    from demuxalot_tpu.models.demux import Demultiplexer, _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import STAGE_COLS, tiled_logits_impl
    from demuxalot_tpu.sim import synthesize_device_workload

    backend = jax.default_backend()
    print(f"# backend: {backend}  STAGE_COLS={STAGE_COLS}")
    if backend != "tpu":
        print("TPU required; exiting")
        return

    betas, v2s, vid, cb, q, _ = synthesize_device_workload(
        N_BARCODES, N_DONORS, N_SNPS, CPB, seed=0
    )
    n_variants = betas.shape[0]
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_DONORS)], 0.35)
    pen = L.doublet_penalties(N_DONORS, 0.35)
    gp = L.probs_from_betas(jnp.asarray(betas), jnp.asarray(v2s), N_SNPS, 0.01)

    rec = np.recarray(len(vid), dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = v2s[vid]
    dev = _PallasLogits(
        rec, N_BARCODES, mixing, pen,
        Demultiplexer.pallas_tile_barcodes, Demultiplexer.pallas_chunk_calls,
        n_variants=n_variants,
    ).device
    args = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
            dev.chunk_bounds, dev.chunk_suboff)
    print(f"# layout: tc={dev.chunk_calls} n_chunks={dev.n_chunks} n_super={dev.n_super}")

    def step(c, a):
        g, o = a
        out = tiled_logits_impl(
            g + c, *o,
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs,
        )
        return jnp.sum(out) * 1e-30

    t = chain_time(step, (gp, args), k=12)
    print(f"E-step (gather + kernel): {t*1e3:.2f} ms  [STAGE_COLS={STAGE_COLS}]")


if __name__ == "__main__":
    main()
