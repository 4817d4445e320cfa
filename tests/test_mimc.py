"""MiMC cubing-chain model family: single-register degree-3 AIR at
arbitrary trace lengths (x -> x^3 + k)."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.mimc import DEFAULT_KEY, MimcAir, MimcStark
from stark_tpu.rng import DeterministicRandom


def test_air_trace_and_constraints():
    air = MimcAir(10)
    seed = FieldElement(3)
    trace = air.trace(seed)
    assert len(trace) == 11
    # forward map recomputed longhand
    x = seed
    for row in trace[1:]:
        x = x * x * x + DEFAULT_KEY
        assert row[0] == x
    (constraint,) = air.transition_constraints()
    omicron = FieldElement.primitive_nth_root(128)
    for o in range(len(trace) - 1):
        point = [omicron.pow(o), trace[o][0], trace[o + 1][0]]
        assert constraint.eval(point) == FieldElement.zero()
    # a perturbed cell must violate the constraint at its step
    bad = trace[5][0] + FieldElement.one()
    assert constraint.eval([omicron.pow(4), trace[4][0], bad]) != FieldElement.zero()


@pytest.mark.parametrize("num_steps", [16, 27, 100])
def test_mimc_prove_verify(num_steps):
    model = MimcStark(num_steps, rng=DeterministicRandom(num_steps))
    seed = FieldElement(5)
    result, proof = model.prove(seed)
    assert result == model.air.result(seed)
    assert model.verify(seed, result, proof)
    assert not model.verify(seed, result + FieldElement.one(), proof)
    assert not model.verify(FieldElement(6), result, proof)


def test_mimc_single_register_bookkeeping():
    """num_registers=1 gives 3-variable exponent vectors — a shape the
    Rescue (m=2) and Fibonacci models never produce; the truncating-zip
    degree bounds (stark.rs:143-167 quirk) must still hold."""
    model = MimcStark(30, rng=DeterministicRandom(1))
    assert model.stark.num_registers == 1
    assert model.stark.omicron_domain_length == 128
    seed = FieldElement(12345)
    result, proof = model.prove(seed)
    assert model.verify(seed, result, proof)


def test_mimc_key_separates_instances():
    """Proofs are bound to the round key: a verifier instantiated with a
    different key must reject."""
    k1, k2 = FieldElement(17), FieldElement(18)
    seed = FieldElement(2)
    m1 = MimcStark(16, key=k1, rng=DeterministicRandom(3))
    result, proof = m1.prove(seed)
    assert m1.verify(seed, result, proof)
    m2 = MimcStark(16, key=k2, rng=DeterministicRandom(3))
    assert not m2.verify(seed, result, proof)


def test_mimc_tampered_trace_detected():
    model = MimcStark(32, rng=DeterministicRandom(4))
    air = model.air
    seed = FieldElement(9)
    trace = air.trace(seed)
    trace[10][0] = trace[10][0] + FieldElement.one()
    boundary = air.boundary_constraints(seed, trace[-1][0])
    with pytest.raises(ValueError, match="degree"):
        model.stark.prove(trace, model._constraints, boundary)


def test_mimc_device_pipeline_transcript_identical():
    """The device-resident prover has never seen a single-register model:
    force it at a 512-point FRI domain and require a byte-identical
    transcript vs the host pipeline."""
    from stark_tpu.ops.backend import JaxBackend

    backend = JaxBackend()
    backend.device_prover_min = 512
    seed = FieldElement(777)
    host = MimcStark(30, rng=DeterministicRandom(8))
    dev = MimcStark(30, backend=backend, rng=DeterministicRandom(8))
    assert dev.stark._use_device_pipeline()
    out_h, proof_h = host.prove(seed)
    out_d, proof_d = dev.prove(seed)
    assert out_h == out_d
    assert proof_h == proof_d
    assert dev.verify(seed, out_d, proof_d)
