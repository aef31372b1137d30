"""Decompose the EM-iteration chain cost stage by stage (chain-amortized).

Times nested prefixes of the EM iteration at one shape:
  pfb                 probs_from_betas only
  pfb+estep           ... + Pallas likelihood kernel
  pfb+estep+softmax   ... + posterior softmax
  full EM             ... + Pallas M-step
Differences between consecutive rows attribute wall time to each stage AS
COMPILED IN THE CHAIN (XLA may schedule stages differently than isolated
kernels; this is what the standalone kernel timings cannot show).

Usage: python benchmarks/exp_em_decompose.py [n_barcodes n_snps calls_per_barcode]
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
K = 6


def main():
    from demuxalot_tpu.models.demux import Demultiplexer, _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl
    from demuxalot_tpu.ops.pallas_mstep import (
        TiledMstepCalls, choose_mstep_bands, tiled_mstep_impl,
    )
    from demuxalot_tpu.sim import synthesize_device_workload

    assert jax.default_backend() == "tpu"
    betas, v2s, vid, cb, q, _ = synthesize_device_workload(N_B, N_D, N_S, CPB, seed=0)
    n_variants = betas.shape[0]
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_D)], 0.35)
    pen = L.doublet_penalties(N_D, 0.35)
    pg = mixing.shape[1]
    rec = np.recarray(len(vid), dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = v2s[vid]
    dev = _PallasLogits(
        rec, N_B, mixing, pen, Demultiplexer.pallas_tile_barcodes,
        Demultiplexer.pallas_chunk_calls, n_variants=n_variants,
    ).device
    e_ops = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
             dev.chunk_bounds, dev.chunk_suboff)

    vorder = np.argsort(vid, kind="stable")
    mlayout = TiledMstepCalls(
        vid[vorder], cb[vorder], q[vorder], n_variants, n_barcodes=N_B,
        n_bands=choose_mstep_bands(N_B, N_D), n_genotypes=N_D,
    )
    m_ops = tuple(jnp.asarray(x) for x in (
        mlayout.cb_global, mlayout.vl, mlayout.q,
        mlayout.chunk_bounds, mlayout.chunk_suboff))

    def pfb(addition, a):
        betas_a, v2s_a = a[0], a[1]
        # sim's variant2snp is SNP-sorted, 2 variants per SNP
        return L.probs_from_betas(betas_a + addition, v2s_a, N_S, 0.01, max_per_snp=2)

    def estep(gp, a):
        out = tiled_logits_impl(
            gp, *a[2], n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs)
        return out[:N_B, :pg]

    def mstep(probs, a):
        return tiled_mstep_impl(
            probs, *a[3], n_variants=n_variants, n_genotypes=N_D,
            tv=mlayout.tile_variants, tc=mlayout.chunk_calls,
            sps=mlayout.subtiles_per_super, contribution_power=2.0,
            band_specs=mlayout.band_specs)

    z = jnp.zeros_like(jnp.asarray(betas))
    args = (jnp.asarray(betas), jnp.asarray(v2s), e_ops, m_ops)

    # donor-major chain: the whole genotype state stays [D, V] — no
    # full-table transposes between the M-step output and the next E-step
    def estep_dm(gp_dm, a):
        out = tiled_logits_impl(
            gp_dm, *a[2], n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs, donor_major=True)
        return out[:N_B, :pg]

    def mstep_dm(probs, a):
        return tiled_mstep_impl(
            probs, *a[3], n_variants=n_variants, n_genotypes=N_D,
            tv=mlayout.tile_variants, tc=mlayout.chunk_calls,
            sps=mlayout.subtiles_per_super, contribution_power=2.0,
            band_specs=mlayout.band_specs, donor_major_out=True)

    def em_dm(c_dm, a):
        gp_dm = L.probs_from_betas_donor_major(a[4] + c_dm, a[1], 0.01, max_per_snp=2)
        probs = jax.nn.softmax(estep_dm(gp_dm, a), axis=-1)
        return mstep_dm(probs, a)

    z_dm = jnp.zeros((N_D, n_variants), jnp.float32)
    args = args + (jnp.asarray(betas.T.copy()),)

    # every stage feeds back a variant-table-shaped carry so each chain
    # stays dependent and comparable
    def gather_only(probs, a):
        # the M-step's XLA-side posterior gather without the scatter kernel,
        # replicating tiled_mstep_impl's per-band slicing (cb ids are
        # band-LOCAL whenever the layout is barcode-banded)
        cb_global = a[3][0]
        tc_m = mlayout.chunk_calls
        specs = mlayout.band_specs or ((0, probs.shape[0], 0, mlayout.n_chunks),)
        total = 0.0
        for b_lo, b_hi, c_lo, c_hi in specs:
            table = jax.lax.slice_in_dim(probs, b_lo, b_hi, axis=0)[:, :N_D]
            cb_k = jax.lax.slice_in_dim(cb_global, c_lo * tc_m, c_hi * tc_m, axis=0)
            total = total + jnp.sum(table.T[:, cb_k])
        return total * 1e-30 + z

    def estep_const(c, a):
        # E-step gathering from a loop-invariant genotype table: measures the
        # kernel as the standalone harnesses see it, inside this chain rig
        gp = a[0] * (1.0 + jnp.sum(c) * 1e-30)
        return jnp.sum(estep(gp, a)) * 1e-30 + z

    stages = {
        "pfb": (lambda c, a: pfb(c, a)[:, :N_D] * 1e-30, z),
        "estep(const table)": (estep_const, z),
        "pfb+estep": (lambda c, a: jnp.sum(estep(pfb(c, a), a)) * 1e-30 + z, z),
        "pfb+estep+softmax": (lambda c, a: jnp.sum(
            jax.nn.softmax(estep(pfb(c, a), a), axis=-1)) * 1e-30 + z, z),
        "...+gather (no scatter)": (lambda c, a: gather_only(
            jax.nn.softmax(estep(pfb(c, a), a), axis=-1), a), z),
        "full EM": (
            lambda c, a: mstep(jax.nn.softmax(estep(pfb(c, a), a), axis=-1), a), z),
        "full EM donor-major": (em_dm, z_dm),
    }

    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))
    prev = 0.0
    for name, (step, carry0) in stages.items():
        chain = jax.jit(lambda c, a, s=step: jax.lax.fori_loop(
            0, K, lambda i, c: s(c, a), c))
        float(jnp.sum(chain(carry0, args)))
        lat = min((lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(5))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(chain(carry0, args)))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - lat, 0) / K * 1e3
        print(f"{name:20s} {ms:8.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
