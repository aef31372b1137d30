"""Platform-selection workaround for environments that ignore JAX_PLATFORMS.

Some jax builds (e.g. this machine's tunneled-TPU build) ignore the
JAX_PLATFORMS environment variable; forcing the platform must go through
jax.config before the backend initializes. Call this at the top of any
script that should honor the env var.
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Honor JAX_PLATFORMS on builds that ignore it, then guard the tunnel.

    Every benchmark/entry script calls this once before touching jax, so
    it doubles as the shared bootstrap: after platform selection it also
    probes the loopback relay (see :func:`fall_back_if_tunnel_down`) —
    a dead relay otherwise hangs the first device operation forever.
    """
    requested = os.environ.get("JAX_PLATFORMS", "")
    if requested and requested != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass  # backend already initialized; nothing to do
    fall_back_if_tunnel_down()


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable JAX's on-disk executable cache for this process.

    Compiles on this machine go through a remote (tunneled) compiler
    service, so a cold program costs minutes of wall-clock even when
    nothing changed; the persistent cache replays the serialized
    executable instead. Called by the benchmark/entry scripts (bench.py,
    benchmarks/*, __graft_entry__) — the library itself never writes to
    disk implicitly. Opt out with DEMUX_JAX_CACHE=0; relocate with
    DEMUX_JAX_CACHE_DIR. Returns True when the cache was enabled.
    """
    if os.environ.get("DEMUX_JAX_CACHE", "1") == "0":
        return False
    cache_dir = cache_dir or os.environ.get(
        "DEMUX_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/demuxalot_tpu/jax"),
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: on this machine even a trivial program costs a
        # remote compiler round trip, so there is no "too small to cache"
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False  # older jax / read-only home: run uncached


RELAY_PORTS = (8082, 8092, 8102, 8112)


def _tunnel_expected() -> bool:
    """True when this process is configured to reach the TPU via loopback relay."""
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return False
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # not a tunneled-TPU environment
    # the probe targets loopback, so it is only meaningful when the client
    # actually dials loopback (zero-egress relay setups set these)
    if (
        os.environ.get("AXON_POOL_SVC_OVERRIDE", "127.0.0.1") != "127.0.0.1"
        and os.environ.get("AXON_LOOPBACK_RELAY") != "1"
    ):
        return False
    return True


def _probe_relay(ports=RELAY_PORTS, timeout_s: float = 2.0) -> bool:
    """One round of TCP probes; True when any relay port accepts."""
    import socket

    for port in ports:
        s = socket.socket()
        s.settimeout(timeout_s)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def wait_for_tunnel(max_wait_s: float = 0.0, poll_s: float = 15.0) -> dict:
    """Probe the TPU relay, retrying with backoff for up to ``max_wait_s``.

    The relay is an external process this VM cannot restart; a transient
    outage (orchestrator restart, queue drain) usually heals within a few
    minutes, so benchmarks should wait bounded-long rather than silently
    falling back to CPU. Returns a diagnosis dict suitable for embedding in
    a benchmark artifact::

        {"expected": bool,   # is this even a tunneled-TPU environment?
         "reachable": bool,  # did any relay port accept before the deadline?
         "waited_s": float,  # how long we polled
         "ports": [...]}     # which loopback ports were probed
    """
    import time as _time

    diag = {"expected": _tunnel_expected(), "reachable": False,
            "waited_s": 0.0, "ports": list(RELAY_PORTS)}
    if not diag["expected"]:
        return diag
    t0 = _time.monotonic()
    while True:
        if _probe_relay():
            diag["reachable"] = True
            break
        waited = _time.monotonic() - t0
        if waited >= max_wait_s:
            break
        print(
            f"# TPU relay unreachable; retrying for up to {max_wait_s - waited:.0f}s more",
            file=__import__("sys").stderr, flush=True,
        )
        _time.sleep(min(poll_s, max(0.0, max_wait_s - waited)))
    diag["waited_s"] = round(_time.monotonic() - t0, 1)
    return diag


def fall_back_if_tunnel_down(ports=RELAY_PORTS, timeout_s: float = 2.0) -> bool:
    """Force the CPU backend when a tunneled-TPU relay is unreachable.

    This machine reaches its TPU through a loopback relay; if the relay
    process is gone, the first device operation hangs indefinitely instead
    of failing. Probe the relay ports before touching the backend and fall
    back to CPU (returning True) when none accept — a degraded benchmark
    beats a hung one. No-op unless the default platform is the tunneled one.
    """
    import sys as _sys

    if not _tunnel_expected():
        return False
    if _probe_relay(ports, timeout_s):
        return False  # relay alive
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        # backend already initialized — can't switch, but the caller MUST
        # hear that the next device op will hang
        print(
            "# WARNING: TPU relay unreachable AND the backend is already "
            "initialized; device operations will hang",
            file=_sys.stderr, flush=True,
        )
        return False
    print(
        "# TPU relay unreachable (all relay ports refused); falling back to CPU",
        file=_sys.stderr, flush=True,
    )
    return True


def tune_numpy_allocator() -> None:
    """Disable numpy's MADV_HUGEPAGE on hosts where huge-page faults stall.

    numpy madvises transparent huge pages for every large buffer; on VMs
    where huge-page faults trigger synchronous compaction this makes each
    fresh allocation ~100x slower (measured here: 128 MB np.empty+fill
    6.7-14 s vs 0.06 s with the madvise off; raw malloc'd memory writes at
    ~2 GB/s either way). Host-side packing/layout at 4M calls dropped from
    ~53 s to ~2 s. Set ``DEMUX_NUMPY_HUGEPAGE=1`` to keep numpy's default.
    Uses the runtime setter so it works regardless of import order; the
    private API is absent on other numpy versions, in which case the env
    var (read at numpy import) is the only lever and we leave it alone.
    """
    if os.environ.get("DEMUX_NUMPY_HUGEPAGE") == "1":
        return
    try:
        try:
            from numpy._core import _multiarray_umath as _mu  # numpy >= 2
        except ImportError:
            from numpy.core import _multiarray_umath as _mu  # numpy 1.x

        _mu._set_madvise_hugepage(False)
    except Exception:
        pass
    _tune_glibc_malloc()


def _tune_glibc_malloc() -> None:
    """Serve large allocations from the persistent heap, not mmap/munmap.

    glibc hands every malloc above M_MMAP_THRESHOLD to mmap and unmaps it on
    free, so each multi-hundred-MB numpy buffer in the packing/layout path
    re-faults its whole extent — and minor-fault servicing on this VM is
    erratic (measured 0.5-3.6 s of stime for identical back-to-back work).
    Raising the mmap and trim thresholds keeps the pages in the heap across
    allocations of *different* sizes (numpy's own cache only helps repeats
    of the same size): measured 2x even on the warm same-size cycle, and it
    removes the multi-second outliers on mixed-size sequences. Costs RSS
    staying at the high-water mark — acceptable on this class of host.
    ``DEMUX_GLIBC_MALLOC_TUNE=0`` disables.
    """
    if os.environ.get("DEMUX_GLIBC_MALLOC_TUNE") == "0":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass
