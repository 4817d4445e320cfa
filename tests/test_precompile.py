"""Parallel AOT precompile: the enumerated modules must cover a real
device prove (no lazy compiles left on the hot path), and precompiling
must not change transcripts.

The coverage test compiles ~15 sizable XLA:CPU modules (precompile pool
+ two full device proves).  XLA:CPU segfaults nondeterministically once
one process holds many test files' worth of compiled modules (see
CLAUDE.md), and this test pushed the shared xdist worker over that
cliff, so it runs its body in a FRESH subprocess and asserts on the exit
code.
"""

import os
import subprocess
import sys

from stark_tpu.models.fibonacci import FibonacciStark
from stark_tpu.rng import DeterministicRandom


def _fresh(steps=1200):
    # 1208-cycle randomized trace -> 4096 omicron domain -> 16384 FRI
    # domain: crosses device_prover_min AND the cascade's device floor,
    # so the precompile enumeration exercises every job family
    from stark_tpu.ops.backend import JaxBackend

    return FibonacciStark(
        steps, backend=JaxBackend(), rng=DeterministicRandom(11)
    )


def _driver():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from stark_tpu.field import FieldElement

    model = _fresh()
    assert model.stark._use_device_pipeline()
    timings = model.precompile(threads=2)
    assert timings and all(v >= 0 for v in timings.values()), timings
    core = model.stark._device_core_cache
    keys_before = set(core._comb_cache)
    ext_traces = core._ext_jit._cache_size()
    ext_mont_traces = core._ext_mont_jit._cache_size()

    a, b = FieldElement(1), FieldElement(1)
    result, proof = model.prove(a, b)
    assert model.verify(a, b, result, proof)

    # the real prove must not have minted any cache entry the
    # enumeration missed — this pins the transcript-prefix arithmetic
    # (cascade body lengths / object counts) and every shape
    assert set(core._comb_cache) == keys_before
    assert core._ext_jit._cache_size() == ext_traces
    assert core._ext_mont_jit._cache_size() == ext_mont_traces

    # byte-identical to an un-precompiled prove (same rng stream)
    model2 = _fresh()
    result2, proof2 = model2.prove(a, b)
    assert result2 == result and proof2 == proof
    print("precompile coverage OK")


def test_precompile_covers_real_prove():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the driver pins cpu itself
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=repo_root,
        env=env,
    )
    assert proc.returncode == 0, (
        f"precompile driver failed (rc {proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    assert "precompile coverage OK" in proc.stdout


def test_precompile_noop_without_device_pipeline():
    model = FibonacciStark(16, rng=DeterministicRandom(1))
    assert model.precompile() is None


if __name__ == "__main__":
    _driver()
