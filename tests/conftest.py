"""Test configuration.

Tests run on a CPU platform with 8 virtual devices so that multi-chip
sharding (mesh + collectives) is exercised in CI without TPU hardware —
the standard JAX trick (``xla_force_host_platform_device_count``).
Benchmarks (bench.py) do NOT import this and run on real TPU chips.

Note: this environment's sitecustomize force-registers the TPU ("axon")
backend and overrides the JAX_PLATFORMS env var, so the platform is also
pinned via jax.config, which wins over the sitecustomize setting as long
as it happens before the first backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the limb-arithmetic graphs are large and
# XLA:CPU compiles them slowly; cache across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
