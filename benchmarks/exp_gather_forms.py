"""Probe which in-kernel dynamic-gather forms Mosaic lowers, and how fast.

The round-3 take-canary (exp_kernel_gather.py) failed with "Shape mismatch
in input, indices and output" — evidence that Mosaic HAS a gather lowering
but constrains the shapes (hardware DynamicGather works on same-shape
vectors). This script enumerates candidate forms, each as a tiny grid-1
kernel (fast, wedge-safe remote compiles), reports lower/correct per form,
then microbenches every form that works at a realistic chunk shape to see
whether an in-VMEM gather can beat the XLA gather engine's ~2.6 ns/row
floor (benchmarks/exp_gather_regime.py) that binds both EM kernels.

Forms probed (table rows R x width W, C gathered rows):
  A. jnp.take(table, idx1d, axis=0)            out [C, W]   (the failed canary)
  B. same, but C == R (same-shape output)
  C. jnp.take_along_axis(table, idx2d, axis=0) idx [C, W] broadcast of idx1d
  D. same-shape take_along_axis axis=0         idx [R, W]
  E. take_along_axis axis=1 (lane gather)      table [S, L], idx [S, L]
  F. one-hot matmul gather (always lowers; MXU-cost baseline)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import timed


def run_form(name, kernel, out_shape, *arrays, interpret):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrays],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    try:
        out = np.asarray(fn(*[jnp.asarray(a) for a in arrays]))
        return out
    except Exception as e:  # noqa: BLE001 - any lowering failure is data here
        msg = " ".join(str(e).split())[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    backend = jax.default_backend()
    interpret = backend != "tpu"
    print(f"# backend: {backend} interpret: {interpret}")
    rng = np.random.default_rng(0)

    R, W, C = 1024, 128, 256
    table = rng.random((R, W), dtype=np.float32)
    idx1 = rng.integers(0, R, C).astype(np.int32)

    # A: non-same-shape take (expected FAIL per the canary)
    out = run_form(
        "A take axis0 [C]!=[R]",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take(t_ref[:], i_ref[0, :], axis=0)
        ),
        (C, W), table, idx1[None, :], interpret=interpret,
    )
    if out is not None:
        print("A take axis0 [C]!=[R]: ok", bool(np.allclose(out, table[idx1])))

    # B: same-shape take along axis 0
    idxR = rng.integers(0, R, R).astype(np.int32)
    out = run_form(
        "B take axis0 same-shape",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take(t_ref[:], i_ref[0, :], axis=0)
        ),
        (R, W), table, idxR[None, :], interpret=interpret,
    )
    if out is not None:
        print("B take axis0 same-shape: ok", bool(np.allclose(out, table[idxR])))

    # C: take_along_axis with broadcast 2-D indices, C != R
    idx2 = np.broadcast_to(idx1[:, None], (C, W)).copy()
    out = run_form(
        "C tal axis0 [C,W] from [R,W]",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
        ),
        (C, W), table, idx2, interpret=interpret,
    )
    if out is not None:
        print("C tal axis0 [C,W] from [R,W]: ok", bool(np.allclose(out, table[idx1])))

    # D: same-shape take_along_axis axis 0
    idx2R = np.broadcast_to(idxR[:, None], (R, W)).copy()
    out = run_form(
        "D tal axis0 same-shape",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
        ),
        (R, W), table, idx2R, interpret=interpret,
    )
    if out is not None:
        print("D tal axis0 same-shape: ok", bool(np.allclose(out, table[idxR])))

    # D2: same-shape take_along_axis axis 0, taller table (sublane count 8192)
    R2 = 8192
    table2 = rng.random((R2, W), dtype=np.float32)
    idxR2 = rng.integers(0, R2, R2).astype(np.int32)
    idx2R2 = np.broadcast_to(idxR2[:, None], (R2, W)).copy()
    out = run_form(
        "D2 tal axis0 same-shape 8192",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
        ),
        (R2, W), table2, idx2R2, interpret=interpret,
    )
    if out is not None:
        print("D2 tal axis0 same-shape 8192: ok", bool(np.allclose(out, table2[idxR2])))

    # E: lane-axis take_along_axis, same shape
    S, L = 256, 128
    tableL = rng.random((S, L), dtype=np.float32)
    idxL = rng.integers(0, L, (S, L)).astype(np.int32)
    out = run_form(
        "E tal axis1 same-shape L=128",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
        ),
        (S, L), tableL, idxL, interpret=interpret,
    )
    if out is not None:
        print("E tal axis1 same-shape L=128: ok",
              bool(np.allclose(out, np.take_along_axis(tableL, idxL, axis=1))))

    # E2: lane gather across 512 lanes (crosses the 128-lane register)
    L2 = 512
    tableL2 = rng.random((S, L2), dtype=np.float32)
    idxL2 = rng.integers(0, L2, (S, L2)).astype(np.int32)
    out = run_form(
        "E2 tal axis1 same-shape L=512",
        lambda t_ref, i_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
        ),
        (S, L2), tableL2, idxL2, interpret=interpret,
    )
    if out is not None:
        print("E2 tal axis1 same-shape L=512: ok",
              bool(np.allclose(out, np.take_along_axis(tableL2, idxL2, axis=1))))

    if interpret:
        print("# interpret mode: stopping before TPU microbench")
        return

    # --- microbench every form that lowered, at EM-kernel-like shapes ---
    # Target shape: gather rows of width 32 (donor columns) for TC=1024-call
    # chunks from a resident table. XLA floor to beat: ~2.6 ns/row.
    print("# microbench: 4M gathered rows of width 32, vs XLA gather")
    RB, WB, NIDX = 8192, 32, 4_194_304
    tb = jnp.asarray(rng.random((RB, WB), dtype=np.float32))
    ib = jnp.asarray(rng.integers(0, RB, NIDX).astype(np.int32))

    @jax.jit
    def xla_gather(t, i):
        return jnp.sum(t[i], dtype=jnp.float32)

    t_x = timed(xla_gather, tb, ib)
    print(f"XLA gather: {t_x*1e3:.2f} ms ({t_x/NIDX*1e9:.2f} ns/row)")

    # Same-shape sublane gather done chunk-wise inside one kernel:
    # resident table [RB, WB]; per step DMA TC indices, broadcast to
    # [TC, WB], but same-shape means gathering RB rows per op -- so gather
    # with a TC=RB block of indices per grid step.
    TCB = RB  # same-shape constraint: one gather of RB rows per step
    steps = NIDX // TCB

    def ig_kernel(i_hbm, t_ref, o_ref, ibuf, isem):
        s = pl.program_id(0)
        cp = pltpu.make_async_copy(i_hbm.at[:, pl.ds(s * TCB, TCB)], ibuf, isem)
        cp.start()

        @pl.when(s == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        cp.wait()
        idx2d = jax.lax.broadcast_in_dim(ibuf[0, :], (TCB, WB), (0,))
        rows = jnp.take_along_axis(t_ref[:], idx2d, axis=0)
        o_ref[0, 0] += jnp.sum(rows)

    fn = pl.pallas_call(
        ig_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, TCB), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    try:
        t_k = timed(jax.jit(lambda t, i: jnp.sum(fn(i, t))), tb, ib[None, :])
        print(f"in-kernel tal gather: {t_k*1e3:.2f} ms ({t_k/NIDX*1e9:.2f} ns/row)")
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:200]
        print(f"in-kernel tal gather microbench: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
