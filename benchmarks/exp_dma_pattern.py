"""Isolate the M-step kernel's DMA pattern cost: chunk-strided vs super-sized.

The M-step kernel DMAs wt as [D=32, tc] column slices of a donor-major
[32, n_slots] HBM array — 32 strided runs of tc*4 bytes per chunk. This
microbench streams the same total bytes through VMEM with (a) that exact
pattern, (b) super-tile-sized column slices (runs 64-128x longer), and
(c) a call-major [tc, 32] contiguous pattern, all double-buffered,
compute = one vector add per block (negligible). If (b)/(c) are much
faster than (a), the kernel should fetch at super-tile granularity.

Usage: python benchmarks/exp_dma_pattern.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 32
N_SLOTS = 4_456_448  # ~bench-shape slot count, multiple of 2048*64
K = 8


def stream_cols(width):
    """Kernel streaming [D, N_SLOTS] via [D, width] double-buffered DMAs."""
    steps = N_SLOTS // width

    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, width)], buf.at[0], sem.at[0]
            ).start()

        @pl.when(i + 1 < steps)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds((i + 1) * width, width)],
                buf.at[(i + 1) % 2], sem.at[(i + 1) % 2],
            ).start()

        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * width, width)], buf.at[i % 2], sem.at[i % 2]
        ).wait()
        o_ref[:, :] += jnp.sum(buf[i % 2, :, :128], keepdims=True)[:1, :1]

    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, D, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def stream_rows(rows):
    """Kernel streaming [N_SLOTS, D] via [rows, D] double-buffered DMAs."""
    steps = N_SLOTS // rows

    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, rows)], buf.at[0], sem.at[0]
            ).start()

        @pl.when(i + 1 < steps)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds((i + 1) * rows, rows)],
                buf.at[(i + 1) % 2], sem.at[(i + 1) % 2],
            ).start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * rows, rows)], buf.at[i % 2], sem.at[i % 2]
        ).wait()
        o_ref[:, :] += jnp.sum(buf[i % 2, :8, :], keepdims=True)[:1, :1]

    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def timeit(fn, *args):
    trivial = jax.jit(lambda x: jnp.sum(x) * 1.0000001)
    small = jnp.ones((8,))
    float(trivial(small))
    chain = jax.jit(lambda c, a: jax.lax.fori_loop(
        0, K, lambda i, c: c + jnp.sum(fn(a + c * 0)), c))
    float(chain(jnp.float32(0.0), args[0]))
    lat = min((lambda t0: (float(trivial(small)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(jnp.float32(0.0), args[0]))
        best = min(best, time.perf_counter() - t0)
    return max(best - lat, 0) / K


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    gb = N_SLOTS * D * 4 / 1e9
    xc = jnp.asarray(rng.random((D, N_SLOTS), np.float32))
    for width in (512, 2048, 8192, 32768):
        t = timeit(stream_cols(width), xc)
        print(f"donor-major [32,{width:6d}] slices: {t*1e3:7.2f} ms "
              f"({gb/t:6.1f} GB/s)", flush=True)
    del xc
    xr = jnp.asarray(rng.random((N_SLOTS, D), np.float32))
    for rows in (512, 2048, 8192, 32768):
        t = timeit(stream_rows(rows), xr)
        print(f"call-major  [{rows:5d},32] slices: {t*1e3:7.2f} ms "
              f"({gb/t:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
