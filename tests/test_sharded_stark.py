"""Full STARK prove on a mesh (ShardedBackend -> ShardedProverCore).

The complete pipeline — trace RS-extension, AIR codewords, quotients,
combination, FRI folds, Merkle commitments — runs with every codeword
sharded over an 8-virtual-device CPU mesh, and must produce proofs
BYTE-IDENTICAL to the host prover (VERDICT r1 item 2: >= 2^14 domain)."""

import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciStark
from stark_tpu.parallel import cpu_mesh
from stark_tpu.rng import DeterministicRandom


@pytest.fixture(scope="module")
def mesh():
    return cpu_mesh(8)


def test_inverse_from_fourstep_roundtrip(mesh):
    from stark_tpu.ntt import NTT
    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops.limbs import pack, unpack
    from stark_tpu.parallel import ShardedNTT
    from stark_tpu.params import P, R_MOD_P
    import jax

    n = 1 << 11
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    sntt = ShardedNTT(n, mesh)
    mat = sntt.to_matrix(pack([v * R_MOD_P % P for v in vals]))
    fwd = sntt.forward(sntt.shard_input(mat))
    back = sntt.inverse_from_fourstep(fwd)
    nat = np.asarray(jax.device_get(back)).reshape(8, n)  # j = j1*C+j2
    got = unpack(np.asarray(jax.device_get(fo.from_mont(jax.numpy.asarray(nat)))))
    assert got == vals


def test_sharded_stark_proof_byte_identical(mesh):
    """Fibonacci at a 2^14-point FRI domain: host prover vs full sharded
    prover, byte-for-byte."""
    from stark_tpu.parallel import ShardedBackend

    seed = 21
    a, b = FieldElement(1), FieldElement(1)
    host = FibonacciStark(2000, rng=DeterministicRandom(seed))
    assert host.stark.fri_domain_length == 1 << 14
    result, host_proof = host.prove(a, b)

    backend = ShardedBackend(mesh)
    sharded = FibonacciStark(2000, backend=backend, rng=DeterministicRandom(seed))
    assert sharded.stark._use_device_pipeline()
    result2, sharded_proof = sharded.prove(a, b)
    assert result2 == result
    assert sharded_proof == host_proof
    assert sharded.verify(a, b, result2, sharded_proof)

    # the codewords really lived on the mesh in four-step layout
    core = sharded.stark._device_core_cache
    assert core.R * core.C == 1 << 14


def test_sharded_chain_proof_byte_identical():
    """Chained permutations on the mesh: DISTINCT per-constraint
    zeroifier codewords flow through the sharded combination kernel
    (the fibonacci case ships two identical ones).  Byte-identical to
    the host prover.

    Runs in a FRESH subprocess: compiling the chain's sharded
    combination megakernel in a worker that already holds many files'
    compiled modules segfaults XLA:CPU (the instability documented in
    tests/conftest.py — reproduced twice in round-5 full-suite runs,
    never in isolation).  A fresh interpreter holds only this test's
    modules and is stable."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        from stark_tpu.field import FieldElement
        from stark_tpu.models.rescue_chain import RescueChainStark
        from stark_tpu.parallel import ShardedBackend, cpu_mesh
        from stark_tpu.rng import DeterministicRandom

        seed = 9
        x = FieldElement(31337)
        host = RescueChainStark(4, rng=DeterministicRandom(seed))
        out, host_proof = host.prove(x)

        backend = ShardedBackend(cpu_mesh(8), device_prover_min=1024)
        sharded = RescueChainStark(
            4, backend=backend, rng=DeterministicRandom(seed)
        )
        assert sharded.stark._use_device_pipeline()
        out2, sharded_proof = sharded.prove(x)
        assert out2 == out
        assert sharded_proof == host_proof
        assert sharded.verify(out2, sharded_proof)
        print("SHARDED_CHAIN_OK")
        """
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert out.returncode == 0, (out.stdout + out.stderr)[-3000:]
    assert "SHARDED_CHAIN_OK" in out.stdout
