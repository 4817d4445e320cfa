"""Vectorized numpy host field ops vs the scalar golden model."""

import random

from stark_tpu import hostops as ho
from stark_tpu.params import P


def test_hostops_differential():
    rng = random.Random(0)
    n = 1000
    a_vals = [rng.randrange(P) for _ in range(n)] + [0, 1, P - 1, P - 2]
    b_vals = [rng.randrange(P) for _ in range(n)] + [P - 1, 0, P - 1, 2]
    a = ho.to_mont(a_vals)
    b = ho.to_mont(b_vals)
    assert ho.unpack32(ho.pack32(a_vals)) == a_vals
    assert ho.from_mont(ho.mul(a, b)) == [
        x * y % P for x, y in zip(a_vals, b_vals)
    ]
    assert ho.from_mont(ho.add(a, b)) == [
        (x + y) % P for x, y in zip(a_vals, b_vals)
    ]
    assert ho.from_mont(ho.sub(a, b)) == [
        (x - y) % P for x, y in zip(a_vals, b_vals)
    ]


def test_hostops_broadcast():
    rng = random.Random(1)
    vals = [rng.randrange(P) for _ in range(64)]
    scalar = rng.randrange(P)
    a = ho.to_mont(vals)
    s = ho.to_mont([scalar])
    assert ho.from_mont(ho.mul(s, a)) == [scalar * v % P for v in vals]


def test_prover_numpy_columns_transcript_identical():
    """The numpy pointwise path (n >= 4096) must be byte-identical to the
    symbolic coefficient prover."""
    from stark_tpu.field import FieldElement
    from stark_tpu.models.fibonacci import FibonacciAir
    from stark_tpu.rng import DeterministicRandom
    from stark_tpu.stark import Stark

    air = FibonacciAir(500)  # 1024-point omicron domain, 4096-point FRI
    a, b = FieldElement(3), FieldElement(4)
    trace = air.trace(a, b)
    boundary = air.boundary_constraints(a, b, trace[-1][0])
    constraints = air.transition_constraints()

    def prove(algorithm):
        stark = Stark(
            4, 2, 2, air.num_registers, air.trace_length,
            rng=DeterministicRandom(6), algorithm=algorithm,
            degree_target="fri",
        )
        return stark.prove(trace, constraints, boundary)

    assert prove("evaluation") == prove("symbolic")
