"""A/B: EM-chain posterior via in-kernel softmax vs the XLA softmax pass.

The production EM chain (bench.py em_iteration) runs kernel-logits →
XLA softmax over [n_barcodes, PG] → M-step. ``softmax_out=True`` computes
the row-softmax inside the likelihood kernel while each super-tile's block
is still VMEM-resident, trading one extra out-block write for the full
[65k, 640] read+write of the separate pass. Run on TPU (queued in
run_tpu_queue.sh); interpret-equality is covered by
tests/test_pallas_kernel.py::test_in_kernel_softmax_matches_xla.
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


def main():
    from demuxalot_tpu.models.demux import Demultiplexer, _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl
    from demuxalot_tpu.sim import synthesize_device_workload

    backend = jax.default_backend()
    print(f"# backend: {backend}")
    if backend != "tpu":
        print("TPU required for timing; exiting")
        return

    betas, v2s, vid, cb, q, _ = synthesize_device_workload(
        N_BARCODES, N_DONORS, N_SNPS, CPB, seed=0
    )
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_DONORS)], DOUBLET_PRIOR)
    pen = L.doublet_penalties(N_DONORS, DOUBLET_PRIOR)
    n_pg = mixing.shape[1]
    rec = np.recarray(len(vid), dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = v2s[vid]
    gp = L.probs_from_betas(jnp.asarray(betas), jnp.asarray(v2s), N_SNPS, 0.01)

    # separate layouts: softmax_out doubles the resident (and Mosaic-
    # pipeline-double-buffered) output blocks, so its layout must be built
    # with out_blocks=2 or the kernel OOMs the 16 MB scoped VMEM
    def build(out_blocks):
        dev = _PallasLogits(
            rec, N_BARCODES, mixing, pen,
            Demultiplexer.pallas_tile_barcodes, Demultiplexer.pallas_chunk_calls,
            n_variants=betas.shape[0], out_blocks=out_blocks,
        ).device
        ops = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
               dev.chunk_bounds, dev.chunk_suboff)
        common = dict(n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
                      tc=dev.chunk_calls, band_specs=dev.band_specs)
        return ops, common

    ops1, common1 = build(1)
    ops2, common2 = build(2)
    print(f"# layouts: xla tbs={common1['tbs']} fused tbs={common2['tbs']}")

    def xla_side(c, a):
        g, o = a
        out = tiled_logits_impl(g + c, *o, **common1)
        probs = jax.nn.softmax(out[:N_BARCODES, :n_pg], axis=-1)
        return jnp.sum(probs) * 1e-30

    def fused(c, a):
        g, o = a
        _lg, probs = tiled_logits_impl(
            g + c, *o, **common2, softmax_out=True, n_pseudogenotypes=n_pg
        )
        return jnp.sum(probs[:N_BARCODES, :n_pg]) * 1e-30

    t_xla = chain_time(xla_side, (gp, ops1))
    print(f"logits + XLA softmax: {t_xla*1e3:.2f} ms")
    t_fused = chain_time(fused, (gp, ops2))
    print(f"in-kernel softmax:    {t_fused*1e3:.2f} ms ({(t_xla-t_fused)*1e3:+.2f} ms)")


if __name__ == "__main__":
    main()
