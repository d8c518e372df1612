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

# Persistent XLA compilation cache: the default gate is dominated by
# full-model jit compiles (round-3 verdict: 13 min wall); caching compiled
# programs across runs cuts repeat gates to the actual test compute.
# Safe for correctness: keyed on HLO + flags, so any code change that
# alters a program recompiles it.  Override path via LOFTR_TEST_CACHE
# (set empty to disable).
_cache_dir = os.environ.get(
    "LOFTR_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
