"""Test configuration.

Tests run on a CPU platform with 8 virtual devices so that multi-chip
sharding (mesh + collectives) is exercised in CI without TPU hardware —
the standard JAX trick (``xla_force_host_platform_device_count``).
Benchmarks (bench.py) do NOT import this and run on real TPU chips.

Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
