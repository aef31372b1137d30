"""Measure the XLA scatter-add engine: can it beat the 2.6 ns/row gather floor?

Decides the barcode-ordered M-step redesign. Today's M-step gathers one
posterior row PER CALL (same ~2.6 ns/row engine floor as the E-step,
benchmarks/exp_gather_regime.py) and scatters in-kernel via one-hot matmul.
The alternative flips the orientation: process calls in barcode order where
the posterior rows are TILE-LOCAL (free via a small one-hot matmul against
the resident 64-row block), emit per-call contribution rows, and reduce to
variants with an XLA scatter-add / segment-sum. That plan only wins if the
scatter-add's per-row cost at [n_calls, 32] f32 beats the gather floor.

Measured axes: sorted vs unsorted segment ids (XLA has a sorted fast path
via `indices_are_sorted`), segment_sum vs .at[].add, and value width.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

N_CALLS = 4_194_304
N_VARIANTS = 131_072
WIDTHS = (32, 8)


def _timed(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def measure(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(out))  # warm/compile

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.0000001

    small = jnp.ones((8,))
    latency = min(_timed(lambda: float(trivial(small))) for _ in range(5))
    best = min(_timed(lambda: float(jnp.sum(fn(*args)))) for _ in range(iters))
    return max(best - latency, 1e-9)


def main():
    assert jax.default_backend() == "tpu", "TPU required"
    rng = np.random.default_rng(0)
    vid = rng.integers(0, N_VARIANTS, N_CALLS).astype(np.int32)
    vid_sorted = np.sort(vid)

    for w in WIDTHS:
        vals = jnp.asarray(rng.random((N_CALLS, w), dtype=np.float32))
        for name, ids, sorted_flag in (
            ("sorted", vid_sorted, True),
            ("sorted-unhinted", vid_sorted, False),
            ("unsorted", vid, False),
        ):
            ids_d = jnp.asarray(ids)

            seg = jax.jit(lambda v, i: jax.ops.segment_sum(
                v, i, num_segments=N_VARIANTS, indices_are_sorted=sorted_flag))
            t = measure(seg, vals, ids_d)
            print(f"segment_sum w={w:3d} {name:16s}: {t*1e3:7.2f} ms "
                  f"({t/N_CALLS*1e9:5.2f} ns/row)")

        at_add = jax.jit(lambda v, i: jnp.zeros((N_VARIANTS, w), jnp.float32).at[i].add(v))
        t = measure(at_add, vals, jnp.asarray(vid))
        print(f"at[].add    w={w:3d} unsorted        : {t*1e3:7.2f} ms "
              f"({t/N_CALLS*1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
