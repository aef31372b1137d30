"""E-step experiment: group-G call layout to shrink the scatter contraction.

Production kernel cost centers per chunk (measured round 2): the scatter
matmul contracts TC=512 one-hot columns and needs its [PG_sl, TC] log
operand split into two bf16 words first — together roughly half the
kernel. Idea: pad each barcode's calls to a multiple of G = TC/128 and
permute slots within a chunk so the G calls of *group a* sit at lane a of
G consecutive 128-lane tiles. Then

  group_sums[pg, a] = sum_j vals[pg, j*128 + a]   (G-1 aligned tile adds)

and the scatter matmul contracts a fixed 128 group-columns regardless of
TC — 4x (G=4) / 8x (G=8) less scatter work and 4-8x less splitting, at
the cost of ~G/2 padding slots per barcode (+3-6% calls).

Timing per the axon quirks: k dependent iterations chained inside one
jit, scalar readback, min over repeats, tunnel latency subtracted.
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


# ---------------------------------------------------------------------------
# host layout
# ---------------------------------------------------------------------------

class GroupLayout:
    """Barcode-sorted calls in tiles of TB, chunks of TC, G-aligned groups.

    Within a chunk, slot i holds its call at lane (i % G)*128 + i // G, so
    each of the 128 groups is one barcode's run of G slots. ``cbg`` maps
    each group to its barcode index within the tile.
    """

    def __init__(self, cb_sorted, vid_sorted, q_sorted, n_barcodes, tb=32, tc=512):
        G = tc // 128
        assert tc % 128 == 0
        n_tiles = max(1, -(-n_barcodes // tb))
        nb_pad = n_tiles * tb
        counts = np.bincount(cb_sorted, minlength=nb_pad).astype(np.int64)
        padded = -(-counts // G) * G
        tile_slots = padded.reshape(n_tiles, tb).sum(1)
        chunks_per_tile = np.maximum(1, -(-tile_slots // tc))
        n_chunks = int(chunks_per_tile.sum())
        chunk_start = np.concatenate([[0], np.cumsum(chunks_per_tile)[:-1]])

        slot_cum = np.concatenate([[0], np.cumsum(padded)])
        tile_of_b = np.arange(nb_pad) // tb
        tile_slot_base = slot_cum[tile_of_b * tb]
        b_offset = slot_cum[:-1] - tile_slot_base  # slot of barcode start in tile stream

        call_start = np.concatenate([[0], np.cumsum(counts)])
        i = np.arange(len(cb_sorted), dtype=np.int64)
        b = cb_sorted.astype(np.int64)
        r = i - call_start[b]
        s = b_offset[b] + r  # slot within tile stream
        c_local = s // tc
        i_in = s % tc
        lane = (i_in % G) * 128 + i_in // G
        c_global = chunk_start[tile_of_b[b]] + c_local
        dst = c_global * tc + lane

        vid = np.zeros(n_chunks * tc, dtype=np.int32)
        q = np.ones(n_chunks * tc, dtype=np.float32)
        vid[dst] = vid_sorted
        q[dst] = q_sorted

        cbg = np.zeros(n_chunks * 128, dtype=np.int32)
        group_global = c_global * 128 + i_in // G
        cbg[group_global] = (b - tile_of_b[b] * tb).astype(np.int32)

        self.vid = vid
        self.q = q.reshape(1, -1)
        self.cbg = cbg.reshape(1, -1)
        self.chunk2tile = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile)
        self.n_barcodes = n_barcodes
        self.n_tiles = n_tiles
        self.tile_barcodes = tb
        self.chunk_calls = tc
        self.n_chunks = n_chunks


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _dot_words(a, b, dims, n_words):
    if n_words == 0:
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    total = None
    remainder = b
    for _ in range(n_words):
        word = remainder.astype(jnp.bfloat16).astype(jnp.float32)
        remainder = remainder - word
        part = jax.lax.dot_general(
            a, word, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        total = part if total is None else total + part
    return total


def _group_kernel(
    bounds_ref, suboff_ref, u_hbm, cbg_hbm,
    mix_ref, pen_ref, out_ref,
    u_buf, cbg_buf, u_sem, cbg_sem,
    *, tb, tc, pg_sl, n_words, use_log, pad_rmw=False,
):
    G = tc // 128
    s = pl.program_id(0)
    lo = bounds_ref[s]
    hi = bounds_ref[s + 1]
    n = hi - lo

    def dmas(slot, ci):
        return (
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds((lo + ci) * tc, tc)], u_buf.at[slot], u_sem.at[slot]
            ),
            pltpu.make_async_copy(
                cbg_hbm.at[:, pl.ds((lo + ci) * 128, 128)], cbg_buf.at[slot], cbg_sem.at[slot]
            ),
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

        args = _dot_words(mix_ref[:], u_buf[slot], ((1,), (0,)), n_words)  # [PG_sl, TC]
        vals = jnp.log(jnp.maximum(args, 1e-30)) if use_log else args

        gs = vals[:, 0:128]
        for j in range(1, G):
            gs = gs + vals[:, j * 128 : (j + 1) * 128]  # [PG_sl, 128]

        cbg = cbg_buf[slot][0, :]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 0)
        onehot = (row_ids == cbg[None, :]).astype(jnp.float32)  # [TB, 128]
        contribution = _dot_words(onehot, gs, ((1,), (1,)), n_words)  # [TB, PG_sl]

        off = pl.multiple_of(suboff_ref[lo + ci] * tb, tb)
        if pad_rmw:
            pgp = out_ref.shape[1]
            cpad = jnp.pad(contribution, ((0, 0), (0, pgp - pg_sl)))
            out_ref[pl.ds(off, tb), :] += cpad
        else:
            out_ref[pl.ds(off, tb), :pg_sl] += contribution
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def group_logits(
    genotype_prob,  # [V, D]
    mixing_sl,  # [PG_sl, Dp]
    penalties_p,  # [1, PGp]
    vid, one_minus_q, qt, cbg, chunk_bounds, chunk_suboff,
    *, n_super, tbs, tb, tc, n_words=2, use_log=True, pad_rmw=False,
):
    pg_sl, d_pad = mixing_sl.shape
    pgp = penalties_p.shape[1]
    # transpose stays lazy inside the jit: XLA rewrites transpose+column
    # gather into the fast row-gather path (a materialized [D, V] operand
    # would gather along lanes — measured ~15x slower)
    u = genotype_prob.T[:, vid] * one_minus_q + qt  # [D, N]
    if d_pad != genotype_prob.shape[1]:
        u = jnp.pad(u, ((0, d_pad - genotype_prob.shape[1]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((pg_sl, d_pad), lambda s, *_: (0, 0)),
            pl.BlockSpec((1, pgp), lambda s, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tbs, pgp), lambda s, *_: (s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, tc), jnp.float32),
            pltpu.VMEM((2, 1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _group_kernel, tb=tb, tc=tc, pg_sl=pg_sl, n_words=n_words,
        use_log=use_log, pad_rmw=pad_rmw,
    )
    n_chunks = chunk_suboff.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * tbs, pgp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * 2 * (2 * tc * d_pad * pg_sl + 2 * tb * 128 * pg_sl),
            bytes_accessed=u.size * 4,
            transcendentals=n_chunks * tc * pg_sl,
        ),
    )(chunk_bounds, chunk_suboff, u, cbg, mixing_sl, penalties_p)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import TiledDeviceCalls, padded_pg
    from demuxalot_tpu.ops.tiling import choose_subtiles_per_super, tile_barcode_calls
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
    pg_sl = _round_up(pg, 8)
    d_pad = _round_up(n_donors, 8)
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

    def lat():
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(trivial(jnp.zeros(8))))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain_bench(step, carry0, operands, k, label, iters=3):
        chain = jax.jit(
            lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c)
        )
        float(jnp.sum(chain(carry0, operands)))  # compile + warm
        latency = lat()
        best = min(
            (lambda t0: (float(jnp.sum(chain(carry0, operands))), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(iters)
        )
        t = max(best - latency, 1e-9) / k
        print(f"{label:40s} {t*1e3:8.2f} ms", flush=True)
        return t

    # --- production baseline (operands passed explicitly, never closed over) ---
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl

    order = np.argsort(cb, kind="stable")
    tiled = tile_barcode_calls(cb[order], vid[order], q[order], n_barcodes)
    dev = TiledDeviceCalls(mixing, penalties, tiled)
    print(f"prod: n_super={dev.n_super} chunks={dev.n_chunks}", flush=True)
    dev_ops = (dev.mixing_sl, dev.penalties_p, dev.vid, dev.seg_group, dev.q,
               dev.chunk_bounds, dev.chunk_suboff)

    def prod_step(c, a):
        out = tiled_logits_impl(
            a[0] + c, *a[1], n_super=dev.n_super, tbs=dev.tbs,
            tb=dev.tile_barcodes, tc=dev.chunk_calls, band_specs=dev.band_specs,
        )
        return jnp.sum(out[:n_barcodes, :pg]) * 1e-30

    chain_bench(prod_step, jnp.float32(0.0), (gp, dev_ops), k=12,
                label="base (prod kernel+gather)")

    ref = np.asarray(dev.logits(gp))

    # --- group-G variants ---
    for tb, tc in ((32, 512), (32, 1024), (64, 1024)):
        lay = GroupLayout(cb[order], vid[order], q[order], n_barcodes, tb=tb, tc=tc)
        sps = choose_subtiles_per_super(lay.n_tiles, lay.n_chunks, tb, pgp)
        n_super = -(-lay.n_tiles // sps)
        chunks_per_tile = np.bincount(lay.chunk2tile, minlength=lay.n_tiles)
        tile_starts = np.concatenate([[0], np.cumsum(chunks_per_tile)])
        bounds = tile_starts[::sps].tolist()
        if len(bounds) < n_super + 1 or bounds[-1] != lay.n_chunks:
            bounds = (bounds + [lay.n_chunks] * (n_super + 1))[: n_super + 1]
        suboff = (lay.chunk2tile % sps).astype(np.int32)

        mixing_sl = np.zeros((pg_sl, d_pad), np.float32)
        mixing_sl[:pg, :n_donors] = mixing.T
        penalties_p = np.zeros((1, pgp), np.float32)
        penalties_p[0, :pg] = penalties

        ops = (
            gp, jnp.asarray(mixing_sl), jnp.asarray(penalties_p),
            jnp.asarray(lay.vid),
            jnp.asarray((1.0 - lay.q).astype(np.float32)),
            jnp.asarray(np.maximum(lay.q, 1e-4).astype(np.float32)),
            jnp.asarray(lay.cbg),
            jnp.asarray(np.asarray(bounds, dtype=np.int32)),
            jnp.asarray(suboff),
        )
        run = functools.partial(
            group_logits, n_super=n_super, tbs=tb * sps, tb=tb, tc=tc,
        )
        pad_pct = 100.0 * (lay.n_chunks * tc / len(vid) - 1.0)
        print(
            f"G{tc//128} tb={tb} tc={tc}: n_super={n_super} chunks={lay.n_chunks} "
            f"pad={pad_pct:.1f}%",
            flush=True,
        )
        got = np.asarray(jax.jit(run)(*ops))[:n_barcodes, :pg]
        err = np.max(np.abs(got - ref) / (1 + np.abs(ref)))
        print(f"  max rel err vs prod: {err:.2e}", flush=True)
        chain_bench(
            lambda c, a, run=run: jnp.sum(run(a[0] + c, *a[1:])) * 1e-30,
            jnp.float32(0.0), ops, k=12, label=f"  group G={tc//128} tb={tb} tc={tc}",
        )
        if (tb, tc) == (32, 1024):
            chain_bench(
                lambda c, a, run=run: jnp.sum(run(a[0] + c, *a[1:], use_log=False)) * 1e-30,
                jnp.float32(0.0), ops, k=12, label="  ... nolog ablation",
            )
            chain_bench(
                lambda c, a, run=run: jnp.sum(run(a[0] + c, *a[1:], n_words=1)) * 1e-30,
                jnp.float32(0.0), ops, k=12, label="  ... 1-word ablation",
            )


if __name__ == "__main__":
    main()
