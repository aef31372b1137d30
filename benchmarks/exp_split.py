"""Split-matmul E-step variants: ~f32 accuracy from bf16 MXU passes.

Mosaic lowers only DEFAULT and HIGHEST dot precisions. HIGHEST costs ~6
passes + VPU corrections (the dominant E-step cost); DEFAULT is one bf16
pass but rounds operands to 8 mantissa bits. This experiment times a manual
two-word decomposition: the exact-in-bf16 operand (mixing 0/0.5/1, onehot
0/1) stays whole, the other splits as hi=bf16(x), lo=bf16(x-hi) — two
DEFAULT passes recover ~16 mantissa bits, and the MXU accumulates in f32.

Variants (all fold U = G[vid](1-q)+q~ outside the kernel, log on [TC, PG_sl]):
  splitNM — N-word expansion split x M-word scatter split (0 = HIGHEST)
Accuracy is reported against the HIGHEST kernel as logit rel err and
posterior abs err.
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

DEFAULT = jax.lax.Precision.DEFAULT
HIGHEST = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def dot_split(a, b, dims, split_operand, n_words):
    """dot_general with a manual bf16 multi-word split of one operand.

    ``split_operand``: 'a' or 'b' — which side carries non-bf16-exact
    values. n_words=0 falls back to a HIGHEST dot.
    """
    if n_words == 0:
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
    total = None
    rem = a if split_operand == "a" else b
    for _ in range(n_words):
        word = rem.astype(jnp.bfloat16).astype(jnp.float32)
        rem = rem - word
        lhs, rhs = (word, b) if split_operand == "a" else (a, word)
        part = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=DEFAULT,
        )
        total = part if total is None else total + part
    return total


def make_kernel(tb, tc, pg_sl, exp_words, sc_words):
    def kernel(bounds_ref, suboff_ref, u_hbm, cbl_hbm, mix_sl_ref, pen_ref, out_ref,
               u_buf, cbl_buf, u_sem, cbl_sem):
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
        def _warm():
            for d in dmas(0, 0):
                d.start()

        def body(ci, _):
            slot = jax.lax.rem(ci, 2)
            nxt = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < n)
            def _pref():
                for d in dmas(nxt, ci + 1):
                    d.start()

            for d in dmas(slot, ci):
                d.wait()

            # [PG_sl, TC] = mix_sl [PG_sl, D] x U [D, TC]; U is the split side
            args = dot_split(mix_sl_ref[:], u_buf[slot], ((1,), (0,)), "b", exp_words)
            vals = jnp.log(args)

            cbl = cbl_buf[slot][0, :]
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
            onehot = (row_ids == cbl[None, :]).astype(jnp.float32)  # [TB, TC]
            # [TB, PG_sl] = onehot [TB, TC] x vals [PG_sl, TC] over TC; vals split
            contribution = dot_split(onehot, vals, ((1,), (1,)), "b", sc_words)

            off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
            out_ref[pl.ds(off, tb), :pg_sl] += contribution
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    return kernel


def run_variant(gp_t_pad, mix_sl, pen_p, vid, one_minus_q, qt, cb_local,
                bounds, suboff, *, n_super, tbs, tb, tc, pgp, exp_words, sc_words):
    pg_sl, d = mix_sl.shape
    u = gp_t_pad[:, vid] * one_minus_q + qt  # [D, N]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pg_sl, d), lambda s, *_: (0, 0)),
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
    return pl.pallas_call(
        make_kernel(tb, tc, pg_sl, exp_words, sc_words),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=suboff.shape[0] * 2 * tc * d * pg_sl * 2,
            bytes_accessed=u.size * 4,
            transcendentals=suboff.shape[0] * tc * pg_sl,
        ),
    )(bounds, suboff, u, cb_local, mix_sl, pen_p)


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, padded_pg
    from demuxalot_tpu.ops.tiling import tile_barcode_calls
    from demuxalot_tpu.sim import synthesize_device_workload
    from scipy.special import softmax

    assert jax.default_backend() == "tpu"
    n_donors, n_barcodes, n_snps, cpb = 32, 65536, 65536, 64
    betas, v2s, vid, cb, q, _ = synthesize_device_workload(n_barcodes, n_donors, n_snps, cpb, seed=3)
    names = [f"D{i:02}" for i in range(n_donors)]
    mixing, _n = L.pseudogenotype_mixing(names, 0.25)
    pen = L.doublet_penalties(n_donors, 0.25)
    pg = mixing.shape[1]
    pgp = padded_pg(pg)
    gp = jnp.asarray(np.asarray(jax.jit(L.probs_from_betas, static_argnums=(2, 3))(
        jnp.asarray(betas), jnp.asarray(v2s), n_snps, 0.01)))

    order = np.argsort(cb, kind="stable")
    tiled = tile_barcode_calls(cb[order], vid[order], q[order], n_barcodes)
    dev = TiledDeviceCalls(mixing, pen, tiled)

    trivial = jax.jit(lambda x: x + 1)
    float(jnp.sum(trivial(jnp.zeros(8))))
    lat = min(
        (lambda t0: (float(jnp.sum(trivial(jnp.zeros(8)))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(8)
    )
    print(f"tunnel latency ~{lat*1e3:.1f} ms", flush=True)

    pg_sl = _round_up(pg, 8)
    d_pad = _round_up(n_donors, 8)
    gp_t_pad = jnp.asarray(np.pad(np.asarray(gp).T, ((0, d_pad - n_donors), (0, 0))))
    mix_sl = np.zeros((pg_sl, d_pad), np.float32)
    mix_sl[:pg, :n_donors] = mixing.T
    mix_sl = jnp.asarray(mix_sl)
    pen_p = np.zeros((1, pgp), np.float32)
    pen_p[0, :pg] = pen
    pen_p = jnp.asarray(pen_p)
    one_minus_q = jnp.asarray((1.0 - tiled.q).astype(np.float32))
    qt = jnp.asarray(np.maximum(tiled.q, 1e-4).astype(np.float32))
    from demuxalot_tpu.ops.tiling import per_call_segments
    cb_local = jnp.asarray(per_call_segments(tiled).reshape(1, -1))

    run = jax.jit(
        functools.partial(
            run_variant,
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes, tc=dev.chunk_calls, pgp=pgp,
        ),
        static_argnames=("exp_words", "sc_words"),
    )
    args = (gp_t_pad, mix_sl, pen_p, dev.vid, one_minus_q, qt, cb_local,
            dev.chunk_bounds, dev.chunk_suboff)

    def bench(fn, label, n=6):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {max(best-lat,0)*1e3:8.2f} ms", flush=True)

    ref = np.asarray(run(*args, exp_words=0, sc_words=0))[:n_barcodes, :pg]
    ref_post = softmax(ref, axis=1)
    bench(lambda: run(*args, exp_words=0, sc_words=0), "highest (0,0)")
    for ew, sw in [(2, 2), (2, 1), (1, 1), (3, 2)]:
        out = np.asarray(run(*args, exp_words=ew, sc_words=sw))[:n_barcodes, :pg]
        lerr = np.max(np.abs(out - ref) / (1 + np.abs(ref)))
        perr = np.max(np.abs(softmax(out, axis=1) - ref_post))
        bench(lambda: run(*args, exp_words=ew, sc_words=sw), f"split ({ew},{sw})")
        print(f"   ({ew},{sw}): logit rel {lerr:.2e}  posterior abs {perr:.2e}", flush=True)


if __name__ == "__main__":
    main()
