"""Platform-selection workaround for environments that ignore JAX_PLATFORMS.

Some jax builds (e.g. this machine's tunneled-TPU build) ignore the
JAX_PLATFORMS environment variable; forcing the platform must go through
jax.config before the backend initializes. Call this at the top of any
script that should honor the env var.
"""
from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    requested = os.environ.get("JAX_PLATFORMS", "")
    if requested and requested != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass  # backend already initialized; nothing to do


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
