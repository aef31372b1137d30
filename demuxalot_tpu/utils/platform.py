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
