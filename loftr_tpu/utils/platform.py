"""Platform selection helper.

The axon sitecustomize in this environment calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
silently overrides the JAX_PLATFORMS environment variable.  Call
:func:`honor_platform_env` before first backend use to restore env-var
semantics (needed for CPU-only CI / fake-device mesh testing).
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backend already initialized; nothing to do
