"""Shared device-timing discipline for the benchmark scripts.

This environment's TPU is tunneled: ``block_until_ready`` does not block, a
single dispatch costs ~33-160 ms of relay round-trip, and the pool is shared
(20x swings observed within one session). Every timing in benchmarks/ must
therefore follow the same discipline, kept in ONE place here:

- force completion with a scalar readback (``float(...)``), never
  ``block_until_ready``;
- measure the tunnel round-trip with a trivial dispatch and subtract it;
- take the MIN over iterations (contention only ever adds time);
- for ops below ~2x the round-trip, amortize K dependent iterations inside
  one jitted ``fori_loop`` and divide (single dispatches of few-ms kernels
  are 10-60x inflated otherwise).

A fix to any part of this (e.g. re-measuring latency per batch) lands in
every A/B at once instead of drifting across hand-copied variants.
"""
import time

import jax
import jax.numpy as jnp

_SMALL = None


@jax.jit  # ONE compiled dispatch — eager would pay the round-trip twice
def _trivial(x):
    return jnp.sum(x) * 1.0000001


def measure_latency(iters: int = 5) -> float:
    """Min round-trip of a trivial warm dispatch (tunnel + runtime overhead)."""
    global _SMALL
    if _SMALL is None:
        _SMALL = jnp.ones((8,))
        float(_trivial(_SMALL))  # compile + warm outside the timed loop
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(_trivial(_SMALL))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, *args, iters: int = 5) -> float:
    """Min-of-iterations wall time of one dispatch, round-trip subtracted.

    Suitable when ``fn``'s device time is comfortably above the tunnel
    latency; below ~2x latency use :func:`chain_time` instead.
    """
    float(fn(*args))  # compile + warm
    latency = measure_latency()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - latency, 1e-9)


def chain_time(step, operands, k: int = 8, iters: int = 3) -> float:
    """Per-iteration time of ``step`` amortized over a K-long dependent chain.

    ``step(carry, operands) -> carry`` must thread a scalar carry so the K
    iterations cannot be executed in parallel or elided; the whole chain is
    one jitted dispatch, so the tunnel round-trip is paid once and divided
    out. Returns seconds per single ``step``.
    """
    chain = jax.jit(
        lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c)
    )
    float(jnp.sum(chain(jnp.float32(0.0), operands)))  # compile + warm
    latency = measure_latency()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(chain(jnp.float32(0.0), operands)))
        best = min(best, time.perf_counter() - t0)
    return max(best - latency, 1e-9) / k
