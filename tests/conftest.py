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

# NO persistent compilation cache for the CPU test suite.  Reading
# XLA:CPU executables back from the disk cache segfaults/aborts
# nondeterministically on this image once a process has accumulated
# ~10 test files' worth of compiled modules (observed at the same test
# with both a shared and a freshly-written cache; the load-time
# "machine feature +prefer-no-gather not supported" warnings are the
# tell).  Fresh local compiles are slower but reliable; pyproject runs
# test files in isolated xdist worker processes to keep per-process
# module pressure low and wall time acceptable.  The TPU cache
# (/tmp/stark_tpu_jax_cache, used by bench.py) is unaffected.
