"""Test harness: force an 8-device virtual CPU platform so multi-chip sharding
paths are exercised without TPU hardware (the TPU-world fake-backend idiom).

NOTE: this environment's axon sitecustomize calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must update the config back,
before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: CPU compiles of the parity/golden pipelines
# dominate suite wall time (31 min cold in round 2); warm runs skip them.
# Keyed per-machine by XLA/jax versions internally; safe to commit nothing —
# the directory is gitignored.
from saspa_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"
