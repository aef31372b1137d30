"""Canary: can Mosaic lower an in-kernel dynamic gather, and how fast?

If ``jnp.take`` along the sublane axis lowers inside a Pallas TPU kernel
(Mosaic dynamic-gather), both the E-step's genotype-row gather and the
M-step's posterior-row gather could move in-kernel — off the XLA gather
engine whose measured ~2.6 ns/row floor (benchmarks/exp_gather_regime.py)
binds both kernels today. This script (a) compile-checks a tiny take-kernel,
(b) if it compiles on TPU, times an in-kernel chunked gather against the XLA
gather engine at a matched index count.

Queued for the next relay window (see run_tpu_queue.sh); the canary part
also runs in interpret mode anywhere (validates shapes, not speed).
"""
import functools
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

# kept modest: table [N_ROWS, WIDTH] f32 must sit in VMEM (~16 MB/core)
N_ROWS, WIDTH = 8192, 64  # 2 MB table
TC = 4096  # gathered rows per grid step
N_STEPS = 256  # ~1M indices; grid stays under the remote-compile-safe cap
N_IDX = TC * N_STEPS


def _take_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[0, :], axis=0)


def try_take_kernel(interpret: bool):
    table = np.random.rand(N_ROWS, WIDTH).astype(np.float32)
    idx = np.random.randint(0, N_ROWS, (1, 256)).astype(np.int32)
    fn = pl.pallas_call(
        _take_kernel,
        out_shape=jax.ShapeDtypeStruct((256, WIDTH), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    try:
        out = np.asarray(fn(jnp.asarray(idx), jnp.asarray(table)))
        return True, bool(np.allclose(out, table[idx[0]]))
    except Exception as e:  # noqa: BLE001 - report any lowering failure
        return False, f"{type(e).__name__}: {e}"


def _bench_kernel(idx_hbm, table_ref, acc_ref, idx_buf, idx_sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(idx_hbm.at[:, pl.ds(i * TC, TC)], idx_buf, idx_sem)
    cp.start()

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cp.wait()
    rows = jnp.take(table_ref[:], idx_buf[0, :], axis=0)
    acc_ref[0, 0] += jnp.sum(rows)


def main():
    backend = jax.default_backend()
    print(f"# backend: {backend}")
    compiled, detail = try_take_kernel(interpret=backend != "tpu")
    mode = "interpret" if backend != "tpu" else "mosaic"
    print(f"take-kernel ({mode}) works: {compiled}; correct/detail: {detail}")
    if not compiled or backend != "tpu":
        return

    table = jnp.asarray(np.random.rand(N_ROWS, WIDTH).astype(np.float32))
    idx_np = np.random.randint(0, N_ROWS, N_IDX).astype(np.int32)

    @jax.jit
    def xla_gather(t, i):
        return jnp.sum(t[i], dtype=jnp.float32)

    t_xla = timed(xla_gather, table, jnp.asarray(idx_np))
    print(f"XLA gather ({N_IDX} rows): {t_xla*1e3:.2f} ms ({t_xla/N_IDX*1e9:.2f} ns/row)")

    fn = pl.pallas_call(
        _bench_kernel,
        grid=(N_STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, TC), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel_sum = jax.jit(lambda t, i: jnp.sum(fn(i, t)))  # jit both A/B sides
    t_kern = timed(kernel_sum, table, jnp.asarray(idx_np[None, :]))
    print(f"in-kernel take: {t_kern*1e3:.2f} ms ({t_kern/N_IDX*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main()
