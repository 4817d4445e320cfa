"""Fibonacci model family: arbitrary trace lengths through the generic
STARK machinery."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciAir, FibonacciStark
from stark_tpu.rng import DeterministicRandom


def test_air_trace_and_constraints():
    air = FibonacciAir(10)
    a, b = FieldElement(1), FieldElement(1)
    trace = air.trace(a, b)
    assert len(trace) == 11
    # classic Fibonacci numbers
    assert trace[10][0].value == 144
    constraints = air.transition_constraints()
    omicron = FieldElement.primitive_nth_root(128)
    for o in range(len(trace) - 1):
        point = (
            [omicron.pow(o)]
            + [trace[o][0], trace[o][1]]
            + [trace[o + 1][0], trace[o + 1][1]]
        )
        for c in constraints:
            assert c.eval(point) == FieldElement.zero()


@pytest.mark.parametrize("num_steps", [16, 27, 100])
def test_fibonacci_prove_verify(num_steps):
    model = FibonacciStark(num_steps, rng=DeterministicRandom(num_steps))
    a, b = FieldElement(1), FieldElement(1)
    result, proof = model.prove(a, b)
    assert model.verify(a, b, result, proof)
    assert not model.verify(a, b, result + FieldElement.one(), proof)
    assert not model.verify(FieldElement(2), b, result, proof)


def test_fibonacci_larger_trace_domain():
    """A 250-step trace pushes the omicron domain to 1024 and the FRI
    domain to 4096 — sizes the reference's hard-coded assert (stark.rs:65)
    can never reach."""
    model = FibonacciStark(250, rng=DeterministicRandom(9))
    assert model.stark.omicron_domain_length == 1024
    assert model.stark.fri_domain_length == 4096
    a, b = FieldElement(3), FieldElement(7)
    result, proof = model.prove(a, b)
    assert model.verify(a, b, result, proof)


def test_fibonacci_tampered_trace_detected():
    model = FibonacciStark(32, rng=DeterministicRandom(4))
    air = model.air
    a, b = FieldElement(1), FieldElement(2)
    trace = air.trace(a, b)
    trace[10][0] = trace[10][0] + FieldElement.one()
    boundary = air.boundary_constraints(a, b, trace[-1][0])
    # the prover's degree check is a typed error (survives `python -O`)
    with pytest.raises(ValueError, match="degree"):
        model.stark.prove(trace, model._constraints, boundary)


def test_fibonacci_long_trace_fast_interpolation():
    """A 500-step trace (1024-point omicron domain, 4096-point FRI domain)
    proves in seconds thanks to the O(n log n) geometric-progression trace
    interpolation (the reference's O(n^2) Lagrange would dominate here)."""
    model = FibonacciStark(500, rng=DeterministicRandom(77))
    assert model.stark.omicron_domain_length == 1024
    a, b = FieldElement(1), FieldElement(1)
    result, proof = model.prove(a, b)
    assert model.verify(a, b, result, proof)
