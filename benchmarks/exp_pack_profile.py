"""Profile the host pack + layout stages at PMBC scale (no device needed).

Times each sub-stage of the PackedCalls engine path (VERDICT r4 ask #1: the
host pack/layout wall) so host-side optimization work can see where the
seconds go.

    python benchmarks/exp_pack_profile.py [n_barcodes] [calls_per_barcode]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import numpy as np

import demuxalot_tpu  # noqa: F401  (numpy allocator tuning)
from synth_calls import synthesize_compressed_calls


def main():
    n_barcodes = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072
    cpb = int(sys.argv[2]) if len(sys.argv) > 2 else 170
    n_donors, n_snps = 32, 350_000

    t0 = time.perf_counter()
    genotypes, calls, _truth, _names = synthesize_compressed_calls(
        n_barcodes=n_barcodes, n_donors=n_donors, n_snps=n_snps,
        calls_per_barcode=cpb,
    )
    print(f"synthesize: {time.perf_counter() - t0:.2f}s "
          f"({n_barcodes * cpb / 1e6:.1f}M molecule calls)")

    import jax

    jax.config.update("jax_platforms", "cpu")
    from demuxalot_tpu.models.demux import Demultiplexer, PackedCalls
    from demuxalot_tpu.ops import packing

    # --- pack: what PackedCalls.__init__ does, sub-staged ------------------
    t0 = time.perf_counter()
    v2s = genotypes.get_snp_ids_for_variants()
    print(f"get_snp_ids_for_variants: {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    mol = packing.match_calls_to_variants(calls, genotypes)
    print(f"match_calls_to_variants: {time.perf_counter() - t0:.3f}s "
          f"({len(mol) / 1e6:.1f}M matched)")

    t0 = time.perf_counter()
    reindex = packing.VariantReindex.build(v2s)
    print(f"VariantReindex.build: {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    calls_v = packing.collapse_device_order(mol, reindex)
    print(f"collapse_device_order: {time.perf_counter() - t0:.3f}s "
          f"({len(calls_v) / 1e6:.1f}M rows)")

    t0 = time.perf_counter()
    _betas = packing.compute_prior_betas(genotypes, mol, v2s, add_data_prior=True)
    print(f"compute_prior_betas: {time.perf_counter() - t0:.3f}s")

    # --- layouts: what forward_layout / mstep_layout build -----------------
    t0 = time.perf_counter()
    cb_s, vid_s, q_s = calls_v.by_barcode()
    print(f"by_barcode (one key sort): {time.perf_counter() - t0:.3f}s")

    from demuxalot_tpu.models.demux import _ForwardCallLayout
    from demuxalot_tpu.ops.pallas_mstep import TiledMstepCalls, choose_mstep_bands

    t0 = time.perf_counter()
    _fwd = _ForwardCallLayout(
        cb_s, vid_s, q_s, n_barcodes, n_donors,
        Demultiplexer.pallas_tile_barcodes, Demultiplexer.pallas_chunk_calls,
        n_variants=genotypes.n_variants,
    )
    print(f"_ForwardCallLayout (banded tiling + stream build): "
          f"{time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    _mstep = TiledMstepCalls(
        calls_v.vid, calls_v.cb, calls_v.q, genotypes.n_variants,
        n_barcodes=n_barcodes,
        n_bands=choose_mstep_bands(n_barcodes, n_donors),
        n_genotypes=n_donors,
    )
    print(f"TiledMstepCalls (no sort): {time.perf_counter() - t0:.3f}s")

    # --- the whole engine pack+layout, as the product runs it --------------
    t0 = time.perf_counter()
    packed = PackedCalls(calls, genotypes)
    t1 = time.perf_counter()
    print(f"PackedCalls(...): {t1 - t0:.3f}s")
    from demuxalot_tpu.ops import likelihood as L

    mixing, _ = L.pseudogenotype_mixing(genotypes.genotype_names, 0.0)
    pen = L.doublet_penalties(n_donors, 0.0)
    t0 = time.perf_counter()
    packed.forward_layout(n_barcodes, mixing, pen,
                          Demultiplexer.pallas_tile_barcodes,
                          Demultiplexer.pallas_chunk_calls)
    t1 = time.perf_counter()
    packed.mstep_layout(n_barcodes, n_donors)
    t2 = time.perf_counter()
    print(f"forward_layout: {t1 - t0:.3f}s  mstep_layout: {t2 - t1:.3f}s")
    mixing2, _ = L.pseudogenotype_mixing(genotypes.genotype_names, 0.35)
    pen2 = L.doublet_penalties(n_donors, 0.35)
    t0 = time.perf_counter()
    packed.forward_layout(n_barcodes, mixing2, pen2,
                          Demultiplexer.pallas_tile_barcodes,
                          Demultiplexer.pallas_chunk_calls)
    print(f"forward_layout (predict prior, shared tiling): "
          f"{time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
