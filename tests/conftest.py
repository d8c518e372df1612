"""Test harness: force a virtual 8-device CPU platform before JAX import.

Multi-chip sharding logic is tested on a fake CPU mesh
(`xla_force_host_platform_device_count`), per SURVEY.md §4's test strategy.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides JAX_PLATFORMS from the environment -
# force CPU again here, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
