"""E-step kernel variant experiments on the real TPU.

Times the current production kernel against restructured candidates to
locate the bottleneck (gather / MXU / VPU-log / padding). The fold trick:
since every mixing column sums to 1, U = G[vid]·(1−q) + q̃ can be computed
per (call, donor) BEFORE the doublet expansion, and (U @ mix) equals the
production (G@mix)·(1−q)+q̃ exactly (padding: q̃=1 → U=1 → log 0). The
[TC, D] row layout is rejected by Mosaic (HBM slices must be 128-aligned
on lanes), so U stays column-major [D, N] like production.

Variants:
  base       — production kernel + its gather
  colgather  — the XLA column gather alone; +fold fused
  folded     — fold + log over [PG_sl, TC] (no lane padding on the log)
  folded_pgp — fold + log over [TC, PGp] (production orientation)
  ablations  — nolog / DEFAULT precision

Timing per the axon quirks: scalar readback forces completion, min over
iterations, tunnel latency subtracted.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _folded_kernel(
    bounds_ref,  # SMEM [n_super + 1]
    suboff_ref,  # SMEM [n_chunks]
    u_hbm,  # ANY [D, n_chunks*TC] pre-folded log arguments (call-major lanes)
    cbl_hbm,  # ANY [1, n_chunks*TC]
    mix_sl_ref,  # VMEM [PG_sl, D] mixing transposed
    mix_ref,  # VMEM [D, PGp] mixing (production orientation)
    pen_ref,  # VMEM [1, PGp]
    out_ref,  # VMEM [TBS, PGp]
    u_buf,  # VMEM [2, D, TC]
    cbl_buf,  # VMEM [2, 1, TC]
    u_sem,
    cbl_sem,
    *,
    tb: int,
    tc: int,
    pg_sl: int,
    use_log: bool,
    transposed_log: bool,
    precision,
):
    s = pl.program_id(0)
    lo = bounds_ref[s]
    hi = bounds_ref[s + 1]
    n = hi - lo

    def dmas(slot, ci):
        base = (lo + ci) * tc
        return (
            pltpu.make_async_copy(u_hbm.at[:, pl.ds(base, tc)], u_buf.at[slot], u_sem.at[slot]),
            pltpu.make_async_copy(cbl_hbm.at[:, pl.ds(base, tc)], cbl_buf.at[slot], cbl_sem.at[slot]),
        )

    out_ref[:] = jnp.broadcast_to(pen_ref[0, :], out_ref.shape)

    @pl.when(n > 0)
    def _warmup():
        for d in dmas(0, 0):
            d.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)
        next_slot = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n)
        def _prefetch():
            for d in dmas(next_slot, ci + 1):
                d.start()

        for d in dmas(slot, ci):
            d.wait()

        cbl = cbl_buf[slot][0, :]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
        onehot = (row_ids == cbl[None, :]).astype(jnp.float32)  # [TB, TC]

        if transposed_log:
            # [PG_sl, TC] = mix_sl [PG_sl, D] x U [D, TC]; log has no lane pad
            args = jax.lax.dot_general(
                mix_sl_ref[:], u_buf[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            vals = jnp.log(args) if use_log else args
            contribution = jax.lax.dot_general(
                onehot, vals,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [TB, PG_sl]
            off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
            out_ref[pl.ds(off, tb), : pg_sl] += contribution
        else:
            # production orientation: [TC, PGp]
            args = jax.lax.dot_general(
                u_buf[slot], mix_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            vals = jnp.log(args) if use_log else args
            contribution = jnp.dot(
                onehot, vals, preferred_element_type=jnp.float32, precision=precision
            )
            off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
            out_ref[pl.ds(off, tb), :] += contribution
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def folded_logits(
    genotype_prob_t,  # [D, V]
    mixing_sl,  # [PG_sl, D]
    mixing_p,  # [D, PGp]
    penalties_p,  # [1, PGp]
    vid,  # [N]
    one_minus_q,  # [1, N]
    qt,  # [1, N]
    cb_local,  # [1, N]
    chunk_bounds,
    chunk_suboff,
    *,
    n_super,
    tbs,
    tb,
    tc,
    use_log=True,
    transposed_log=True,
    precision=jax.lax.Precision.HIGHEST,
    gather_only=False,
):
    pg_sl = mixing_sl.shape[0]
    pgp = penalties_p.shape[1]
    d = genotype_prob_t.shape[0]
    u = genotype_prob_t[:, vid] * one_minus_q + qt  # [D, N] fused column gather
    if gather_only:
        return u
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pg_sl, d), lambda s, *_: (0, 0)),
            pl.BlockSpec((d, pgp), lambda s, *_: (0, 0)),
            pl.BlockSpec((1, pgp), lambda s, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tbs, pgp), lambda s, *_: (s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, d, tc), jnp.float32),
            pltpu.VMEM((2, 1, tc), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _folded_kernel, tb=tb, tc=tc, pg_sl=pg_sl,
        use_log=use_log, transposed_log=transposed_log, precision=precision,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=chunk_suboff.shape[0] * 2 * tc * d * pg_sl * 2,
            bytes_accessed=u.size * 4,
            transcendentals=chunk_suboff.shape[0] * tc * pg_sl,
        ),
    )(chunk_bounds, chunk_suboff, u, cb_local, mixing_sl, mixing_p, penalties_p)


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, padded_pg
    from demuxalot_tpu.ops.tiling import tile_barcode_calls
    from demuxalot_tpu.sim import synthesize_device_workload

    assert jax.default_backend() == "tpu", jax.default_backend()

    n_donors, n_barcodes, n_snps, cpb = 32, 65536, 65536, 64
    betas, variant2snp, vid, cb, q, _truth = synthesize_device_workload(
        n_barcodes, n_donors, n_snps, cpb, seed=3
    )
    names = [f"D{i:02}" for i in range(n_donors)]
    mixing, _ = L.pseudogenotype_mixing(names, 0.25)
    penalties = L.doublet_penalties(n_donors, 0.25)
    pg = mixing.shape[1]
    pgp = padded_pg(pg)
    print(f"shape: D={n_donors} PG={pg} B={n_barcodes} calls={len(vid)}", flush=True)

    gp = jnp.asarray(
        np.asarray(
            jax.jit(L.probs_from_betas, static_argnums=(2, 3))(
                jnp.asarray(betas), jnp.asarray(variant2snp), n_snps, 0.01
            )
        )
    )

    trivial = jax.jit(lambda x: x + 1)
    _ = float(jnp.sum(trivial(jnp.zeros(8))))
    lat = min(
        (lambda t0: (float(jnp.sum(trivial(jnp.zeros(8)))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(8)
    )
    print(f"tunnel latency ~{lat*1e3:.1f} ms", flush=True)

    def bench(fn, n=6, label=""):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {max(best - lat, 0.0)*1e3:8.2f} ms", flush=True)
        return best

    # --- production kernel ---
    order = np.argsort(cb, kind="stable")
    tiled = tile_barcode_calls(cb[order], vid[order], q[order], n_barcodes)
    dev = TiledDeviceCalls(mixing, penalties, tiled)
    print(f"n_super={dev.n_super} tbs={dev.tbs} chunks={dev.n_chunks}", flush=True)
    bench(lambda: dev.logits(gp), label="base (prod kernel+gather)")

    vid_dev = dev.vid
    gp_t = jnp.asarray(np.ascontiguousarray(np.asarray(gp).T))
    colgather = jax.jit(lambda g, v: g[:, v])
    bench(lambda: colgather(gp_t, vid_dev), label="column gather [D,N]")
    one_minus_q = jnp.asarray((1.0 - tiled.q).astype(np.float32))
    qt = jnp.asarray(np.maximum(tiled.q, 1e-4).astype(np.float32))
    colfold = jax.jit(lambda g, v, om, w: g[:, v] * om + w)
    bench(lambda: colfold(gp_t, vid_dev, one_minus_q, qt), label="column gather+fold [D,N]")

    # --- folded kernel variants ---
    pg_sl = _round_up(pg, 8)
    d_pad = _round_up(n_donors, 8)
    gp_t_pad = jnp.asarray(np.pad(np.asarray(gp).T, ((0, d_pad - n_donors), (0, 0))))
    mixing_sl = np.zeros((pg_sl, d_pad), np.float32)
    mixing_sl[:pg, :n_donors] = mixing.T
    mixing_sl = jnp.asarray(mixing_sl)
    mixing_p = np.zeros((d_pad, pgp), np.float32)
    mixing_p[:n_donors, :pg] = mixing
    mixing_p = jnp.asarray(mixing_p)
    penalties_p = np.zeros((1, pgp), np.float32)
    penalties_p[0, :pg] = penalties
    penalties_p = jnp.asarray(penalties_p)
    from demuxalot_tpu.ops.tiling import per_call_segments
    cb_local = jnp.asarray(per_call_segments(tiled).reshape(1, -1))

    run = jax.jit(
        functools.partial(
            folded_logits,
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes, tc=dev.chunk_calls,
        ),
        static_argnames=("use_log", "transposed_log", "precision", "gather_only"),
    )
    args = (gp_t_pad, mixing_sl, mixing_p, penalties_p, vid_dev, one_minus_q, qt,
            cb_local, dev.chunk_bounds, dev.chunk_suboff)
    bench(lambda: run(*args), label="folded sl-log [PGsl,TC]")
    bench(lambda: run(*args, transposed_log=False), label="folded pgp-log [TC,PGp]")
    bench(lambda: run(*args, use_log=False), label="folded sl nolog")
    bench(lambda: run(*args, precision=jax.lax.Precision.DEFAULT), label="folded sl default-prec")

    ref = np.asarray(dev.logits(gp))
    got = np.asarray(run(*args))[:n_barcodes, :pg]
    err = np.max(np.abs(got - ref) / (1 + np.abs(ref)))
    print(f"folded vs base max rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
