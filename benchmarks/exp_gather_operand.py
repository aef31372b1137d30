"""Isolate the in-chain gather slowdown (chain-amortized, M-step shape).

The EM-chain decomposition (exp_em_decompose.py) shows the M-step posterior
gather costing ~2x its standalone time once it lives in the full EM chain.

Phase 1 (default) varies how the gathered table is PRODUCED — parameter vs
freshly materialized/barriered/softmaxed — all measured ~27-29 ms at the
default shape, ruling the operand side out.

PHASE=2 puts the E-step Pallas kernel in the same program: the identical
gather then costs ~3x (27 -> ~81 ms), even with an operand completely
independent of the kernel (docs/DESIGN.md §8).

PHASE=3 varies order / kernel size / gather count around the same pairing.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import os
import jax, numpy as np, jax.numpy as jnp

N_B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
N_SLOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 10652672
N_D, PG, K = 32, 528, 6

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
post = jnp.asarray(rng.random((N_B, PG), np.float32))
cb = jnp.asarray(rng.integers(0, N_B, N_SLOTS).astype(np.int32))

def g(table_t, _):
    return jnp.sum(table_t[:, cb]) * 1e-30

trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
small = jnp.ones((8,))
float(trivial(small))
def lat():
    return min((lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

def run_stages(stages, width=26):
    for name, step in stages.items():
        chain = jax.jit(lambda c, a, s=step: jax.lax.fori_loop(0, K, lambda i, c: s(c, a), c))
        float(chain(jnp.float32(0.0), post))
        l = lat()
        best = min((lambda t0: (float(chain(jnp.float32(0.0), post)), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(3))
        print(f"{name:{width}s} {max(best - l, 0) / K * 1e3:8.2f} ms", flush=True)

def build_estep():
    """PMBC-shaped Pallas E-step closure shared by phases 2 and 3."""
    from demuxalot_tpu.models.demux import Demultiplexer, _PallasLogits
    from demuxalot_tpu.ops import likelihood as L
    from demuxalot_tpu.ops.packing import BARCODE_CALLS_DTYPE
    from demuxalot_tpu.ops.pallas_likelihood import tiled_logits_impl
    from demuxalot_tpu.sim import synthesize_device_workload

    N_S, CPB = 327680, 72
    betas, v2s, vid, cbv, q, _ = synthesize_device_workload(N_B, N_D, N_S, CPB, seed=0)
    mixing, _n = L.pseudogenotype_mixing([f"D{i:02}" for i in range(N_D)], 0.35)
    pen = L.doublet_penalties(N_D, 0.35)
    rec = np.recarray(len(vid), dtype=BARCODE_CALLS_DTYPE)
    rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cbv, q
    rec["snp_id"] = v2s[vid]
    dev = _PallasLogits(
        rec, N_B, mixing, pen, Demultiplexer.pallas_tile_barcodes,
        Demultiplexer.pallas_chunk_calls, n_variants=betas.shape[0],
    ).device
    gp = jnp.asarray(np.random.default_rng(1).random(betas.shape, np.float32))
    pg = mixing.shape[1]

    def estep(t):
        out = tiled_logits_impl(
            gp * (1.0 + t * 1e-30), dev.mixing_sl, dev.penalties_p, dev.vid,
            dev.seg_group, dev.q, dev.chunk_bounds, dev.chunk_suboff,
            n_super=dev.n_super, tbs=dev.tbs, tb=dev.tile_barcodes,
            tc=dev.chunk_calls, band_specs=dev.band_specs)
        return out[:N_B, :pg]

    return estep


def phase1():
    run_stages({
        "param+scalar": lambda c, a: g((a + c)[:, :N_D].T, None) + c,
        "fresh barrier": lambda c, a: g(
            jax.lax.optimization_barrier(a * (1.0 + c * 1e-30))[:, :N_D].T, None) + c,
        "fresh sliced": lambda c, a: g(
            jax.lax.optimization_barrier(a[:, :N_D] * (1.0 + c * 1e-30)).T, None) + c,
        "fresh softmax": lambda c, a: g(
            jax.nn.softmax(a + c * 1e-30, axis=-1)[:, :N_D].T, None) + c,
    }, width=16)


def phase2():
    estep = build_estep()
    run_stages({
        "estep only": lambda c, a: jnp.sum(estep(c)) * 1e-30 + c,
        "estep+gather(indep post)": lambda c, a: jnp.sum(estep(c)) * 1e-30
            + g((a + c * 1e-30)[:, :N_D].T, None) + c,
        "estep+gather(softmax)": lambda c, a: g(
            jax.nn.softmax(estep(c), axis=-1)[:, :N_D].T, None) + c,
    })


def phase3():
    from jax.experimental import pallas as pl

    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    tiny_in = jnp.ones((8, 128), jnp.float32)
    def tiny(t):
        return pl.pallas_call(
            tiny_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(tiny_in * (1.0 + t * 1e-30))

    estep_full = build_estep()
    def estep(t):
        return jnp.sum(estep_full(t)) * 1e-30

    def gaz(c, a):  # one gather, scalar-dependent operand
        return g((a + c * 1e-30)[:, :N_D].T, None)

    run_stages({
        "gather alone": lambda c, a: gaz(c, a) + c,
        "gather THEN estep": lambda c, a: estep(gaz(c, a) * 1e30 + c) + c,
        "tiny pallas + gather": lambda c, a: jnp.sum(tiny(c)) * 1e-30 + gaz(c, a) + c,
        "estep + 2 gathers": lambda c, a: estep(c) + gaz(c, a) + gaz(c + 1e-12, a) + c,
    })


if os.environ.get("PHASE") == "3":
    phase3()
elif os.environ.get("PHASE") == "2":
    phase2()
else:
    phase1()
