"""Device-resident prover pipeline (stark.Stark._prove_device).

The pipeline keeps codewords on the device from RS-extension through the
FRI folds; the backend remains a pure performance seam, so transcripts
must be BYTE-IDENTICAL to the host golden pipeline."""

import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciStark
from stark_tpu.ops.backend import JaxBackend
from stark_tpu.rng import DeterministicRandom


def test_rescue_device_pipeline_transcript_identical():
    """Force the device pipeline at the reference's small config (512-point
    FRI domain) and compare byte-for-byte against the host pipeline —
    which is itself sha256-pinned in test_stark_configs."""
    from stark_tpu.models.rescue_stark import RescueStark

    backend = JaxBackend()
    backend.device_prover_min = 512
    host = RescueStark(rng=DeterministicRandom(5))
    dev = RescueStark(backend=backend, rng=DeterministicRandom(5))
    assert dev.stark._use_device_pipeline()
    x = FieldElement(123456789)
    out_h, proof_h = host.prove(x)
    out_d, proof_d = dev.prove(x)
    assert out_h == out_d
    assert proof_h == proof_d
    assert dev.verify(out_d, proof_d)


def test_fibonacci_device_pipeline_transcript_identical():
    """Device pipeline at its production floor (8192-point FRI domain)."""
    seed = 11
    a, b = FieldElement(3), FieldElement(7)
    host = FibonacciStark(1000, rng=DeterministicRandom(seed))
    assert host.stark.fri_domain_length == 8192
    assert not host.stark._use_device_pipeline()
    result, host_proof = host.prove(a, b)

    dev = FibonacciStark(1000, backend=JaxBackend(), rng=DeterministicRandom(seed))
    assert dev.stark._use_device_pipeline()
    result2, dev_proof = dev.prove(a, b)
    assert result2 == result
    assert dev_proof == host_proof
    assert dev.verify(a, b, result2, dev_proof)

    # the stage breakdown is wired in
    prof = dev.stark.last_profile
    assert prof is not None
    for stage in ("combination", "fri", "bq_merkle", "openings"):
        assert stage in prof.totals


def test_device_pipeline_rejects_tampered_trace():
    """The device degree probe must trip on an inconsistent trace exactly
    like the host check."""
    backend = JaxBackend()
    backend.device_prover_min = 512
    from stark_tpu.models.rescue_stark import RescueStark

    model = RescueStark(backend=backend, rng=DeterministicRandom(6))
    x = FieldElement(42)
    output = model.rescue.hash(x)
    trace = model.rescue.trace(x)
    trace[10][0] = trace[10][0] + FieldElement.one()
    boundary = model.rescue.boundary_constraints(output)
    with pytest.raises(ValueError, match="degree"):
        model.stark.prove(trace, model._air, boundary)


def test_merkle_from_digits_matches_from_codeword():
    rng = np.random.default_rng(0)
    from stark_tpu.merkle import MerkleTree
    from stark_tpu.params import P

    values = [int(rng.integers(0, 1 << 62)) * 7919 % P for _ in range(64)]
    digits = np.zeros((64, 4), dtype=np.uint32)
    for i, v in enumerate(values):
        for k in range(4):
            digits[i, k] = (v >> (32 * k)) & 0xFFFFFFFF
    a = MerkleTree.from_codeword(values)
    b = MerkleTree.from_digits(digits)
    assert a.root == b.root
    assert a.open(17) == b.open(17)


def test_geometric_table_matches_host():
    import jax

    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops.device_prover import geometric_table
    from stark_tpu.ops.limbs import unpack
    from stark_tpu.params import GENERATOR, P

    base = pow(GENERATOR, 12345, P)
    start = pow(GENERATOR, 3, P)
    n = 96
    tab = geometric_table(base, start, n)
    got = unpack(np.asarray(jax.device_get(fo.from_mont(tab))))
    want, cur = [], start
    for _ in range(n):
        want.append(cur)
        cur = cur * base % P
    assert got == want
