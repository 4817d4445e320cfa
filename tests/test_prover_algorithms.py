"""The evaluation-space (TPU-native) prover must be transcript-identical
to the reference-style symbolic/coefficient prover."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.rescue_prime import RescuePrime
from stark_tpu.rng import DeterministicRandom
from stark_tpu.stark import Stark


@pytest.mark.parametrize("config", [(4, 2, 2), (4, 4, 16)])
def test_evaluation_prover_matches_symbolic(config):
    expansion, tests, security = config
    rp = RescuePrime()
    inp = FieldElement.sample(b"equivalence")
    out = rp.hash(inp)
    trace = rp.trace(inp)

    def build(algorithm):
        stark = Stark(
            expansion, tests, security, rp.m, rp.N + 1,
            rng=DeterministicRandom(55), algorithm=algorithm,
        )
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(out)
        return stark, air, boundary

    stark_e, air, boundary = build("evaluation")
    proof_e = stark_e.prove(trace, air, boundary)
    stark_s, air_s, boundary_s = build("symbolic")
    proof_s = stark_s.prove(trace, air_s, boundary_s)

    assert proof_e == proof_s
    assert stark_s.verify(proof_e, air, boundary)


def test_evaluation_prover_rejects_tampered_trace_early():
    """The evaluation prover's degree assertion catches inconsistent traces
    at prove time (the symbolic prover's long division silently truncates
    and produces an unverifiable proof instead, reference:
    univariate_poly.rs:437-484)."""
    rp = RescuePrime()
    inp = FieldElement(3)
    out = rp.hash(inp)
    trace = [list(r) for r in rp.trace(inp)]
    trace[5][1] = trace[5][1] + FieldElement.one()
    stark = Stark(4, 2, 2, rp.m, rp.N + 1, rng=DeterministicRandom(5))
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(out)
    with pytest.raises(ValueError, match="degree"):
        stark.prove(trace, air, boundary)


def test_invalid_algorithm_rejected():
    with pytest.raises(ValueError):
        Stark(4, 2, 2, 2, 28, algorithm="quantum")
