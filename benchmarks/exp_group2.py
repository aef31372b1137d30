"""Round-2 follow-up sweep for the group-G E-step kernel.

Measures (a) the XLA gather+fold alone — the u HBM round-trip suspected of
dominating the E-step, (b) full-lane output RMW (contribution padded to
PGp so the accumulate has no predicated partial lane tile), (c) larger
barcode tiles, (d) G=16. See exp_group.py for the layout.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from exp_group import GroupLayout, group_logits


def main():
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.pallas_likelihood import padded_pg
    from demuxalot_tpu.ops.tiling import choose_subtiles_per_super
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
    pg_sl = ((pg + 7) // 8) * 8
    d_pad = ((n_donors + 7) // 8) * 8
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
        chain = jax.jit(lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c))
        float(jnp.sum(chain(carry0, operands)))
        latency = lat()
        best = min(
            (lambda t0: (float(jnp.sum(chain(carry0, operands))), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(iters)
        )
        t = max(best - latency, 1e-9) / k
        print(f"{label:44s} {t*1e3:8.2f} ms", flush=True)
        return t

    order = np.argsort(cb, kind="stable")

    # reference via a known-good config
    lay0 = GroupLayout(cb[order], vid[order], q[order], n_barcodes, tb=32, tc=512)

    # (a) gather+fold alone, lazy transpose (the production access pattern)
    vid_d = jnp.asarray(lay0.vid)
    omq = jnp.asarray((1.0 - lay0.q).astype(np.float32))
    qt = jnp.asarray(np.maximum(lay0.q, 1e-4).astype(np.float32))

    def gather_step(c, a):
        g, v, om, w = a
        u = (g + c).T[:, v] * om + w
        return jnp.sum(u) * 1e-30

    chain_bench(gather_step, jnp.float32(0.0), (gp, vid_d, omq, qt), k=12,
                label="gather+fold alone [D,N]")

    ref = None
    for tb, tc, pad_rmw in ((64, 1024, True), (128, 1024, False), (64, 2048, False)):
        lay = GroupLayout(cb[order], vid[order], q[order], n_barcodes, tb=tb, tc=tc)
        sps = choose_subtiles_per_super(lay.n_tiles, lay.n_chunks, tb, pgp)
        n_super = -(-lay.n_tiles // sps)
        cpt = np.bincount(lay.chunk2tile, minlength=lay.n_tiles)
        tile_starts = np.concatenate([[0], np.cumsum(cpt)])
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
            pad_rmw=pad_rmw,
        )
        got = np.asarray(jax.jit(run)(*ops))[:n_barcodes, :pg]
        if ref is None:
            ref = got
        else:
            err = np.max(np.abs(got - ref) / (1 + np.abs(ref)))
            print(f"  consistency vs first cfg: {err:.2e}", flush=True)
        chain_bench(
            lambda c, a, run=run: jnp.sum(run(a[0] + c, *a[1:])) * 1e-30,
            jnp.float32(0.0), ops, k=12,
            label=f"  G={tc//128} tb={tb} tc={tc} padrmw={pad_rmw}",
        )


if __name__ == "__main__":
    main()
