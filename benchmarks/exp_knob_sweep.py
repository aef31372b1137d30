"""Sweep the kernel env knobs at the bench shape: Pallas E-step + M-step only.

Times exactly the two production chain-amortized numbers bench.py reports
(pallas_time_s, mstep_time_s) for ONE knob configuration taken from the
environment, skipping bench.py's XLA-path chain compile and numpy baseline
(~4 min saved per point). Drive it from a shell loop:

    for w in 1 8 16; do DEMUX_LOG_FOLD_WIDTH=$w python benchmarks/exp_knob_sweep.py; done

Prints one JSON line: {"knobs": {...}, "estep_s": ..., "mstep_s": ...}.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

N_DONORS = int(os.environ.get("DEMUX_BENCH_DONORS", 32))
N_SNPS = int(os.environ.get("DEMUX_BENCH_SNPS", 65_536))
N_BARCODES = int(os.environ.get("DEMUX_BENCH_BARCODES", 65_536))
CALLS_PER_BARCODE = int(os.environ.get("DEMUX_BENCH_CALLS_PER_BARCODE", 64))
DOUBLET_PRIOR = 0.35

KNOBS = (
    "DEMUX_LOG_FOLD_WIDTH",
    "DEMUX_STACK_SCATTER",
    "DEMUX_MSTEP_FOLD",
    "DEMUX_KERNEL_PRECISION",
)


def main():
    from demuxalot_tpu.models.demux import Demultiplexer, _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl
    from demuxalot_tpu.ops.pallas_mstep import (
        TiledMstepCalls,
        choose_mstep_bands,
        tiled_mstep_impl,
    )
    from demuxalot_tpu.sim import synthesize_device_workload

    assert jax.default_backend() == "tpu", "TPU required"

    betas, variant2snp, vid, cb, q, _ = synthesize_device_workload(
        N_BARCODES, N_DONORS, N_SNPS, CALLS_PER_BARCODE, seed=0
    )
    n_variants = betas.shape[0]
    names = [f"D{i:02}" for i in range(N_DONORS)]
    mixing, _ = L.pseudogenotype_mixing(names, DOUBLET_PRIOR)
    penalties = L.doublet_penalties(N_DONORS, DOUBLET_PRIOR)
    n_pg = mixing.shape[1]
    n_calls = len(vid)

    gp_dev = L.probs_from_betas(jnp.asarray(betas), jnp.asarray(variant2snp), N_SNPS, 0.01)

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.0000001

    small = jnp.ones((8,))

    def _timed(thunk):
        t0 = time.perf_counter()
        thunk()
        return time.perf_counter() - t0

    def chain_time(step, carry0, operands, k, iters=3):
        chain = jax.jit(
            lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c)
        )
        float(jnp.sum(chain(carry0, operands)))
        latency = min(_timed(lambda: float(trivial(small))) for _ in range(5))
        best = min(
            _timed(lambda: float(jnp.sum(chain(carry0, operands)))) for _ in range(iters)
        )
        return max(best - latency, 1e-9) / k

    rec = np.recarray(n_calls, dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
    rec["snp_id"] = variant2snp[vid]
    dev = _PallasLogits(
        rec, N_BARCODES, mixing, penalties,
        Demultiplexer.pallas_tile_barcodes, Demultiplexer.pallas_chunk_calls,
        n_variants=n_variants,
    ).device
    dev_ops = (dev.mixing_sl, dev.penalties_p, dev.vid,
               dev.seg_group, dev.q, dev.chunk_bounds, dev.chunk_suboff)

    def pallas_logits(gp, a):
        out = tiled_logits_impl(
            gp, *a,
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs,
        )
        return out[:N_BARCODES, :n_pg]

    estep_s = chain_time(
        lambda c, a: jnp.sum(pallas_logits(a[0] + c, a[1])) * 1e-30,
        jnp.float32(0.0), (gp_dev, dev_ops), k=12,
    )

    vorder = np.argsort(vid, kind="stable")
    mlayout = TiledMstepCalls(
        vid[vorder], cb[vorder], q[vorder], n_variants,
        n_barcodes=N_BARCODES,
        n_bands=choose_mstep_bands(N_BARCODES, N_DONORS),
        n_genotypes=N_DONORS,
    )
    m_ops = tuple(jnp.asarray(x) for x in (
        mlayout.cb_global, mlayout.vl, mlayout.q,
        mlayout.chunk_bounds, mlayout.chunk_suboff,
    ))

    def mstep_addition(posterior, a):
        return tiled_mstep_impl(
            posterior, *a,
            n_variants=n_variants, n_genotypes=N_DONORS,
            tv=mlayout.tile_variants, tc=mlayout.chunk_calls,
            sps=mlayout.subtiles_per_super, contribution_power=2.0,
            band_specs=mlayout.band_specs,
        )

    probs_fixed = jax.nn.softmax(dev.logits(gp_dev), axis=-1)
    mstep_s = chain_time(
        lambda c, a: jnp.sum(mstep_addition(a[0] + c, a[1])) * 1e-30,
        jnp.float32(0.0), (probs_fixed, m_ops), k=12,
    )

    print(json.dumps({
        "knobs": {k: os.environ.get(k) for k in KNOBS if os.environ.get(k) is not None},
        "estep_s": round(estep_s, 5),
        "mstep_s": round(mstep_s, 5),
        "n_calls": n_calls,
    }))


if __name__ == "__main__":
    main()
