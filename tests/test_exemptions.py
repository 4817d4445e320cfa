"""Selector-aware transition zeroifier: ``transition_exemptions`` lets
an AIR skip constraint enforcement on chosen cycles (segmented /
restarted / multi-phase computations).  The reference has no such
feature (its zeroifier always covers every cycle, stark.rs:134-137);
these tests pin the semantics and the degree bookkeeping."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciAir
from stark_tpu.rng import DeterministicRandom
from stark_tpu.stark import Stark


def _segmented_trace(seg_len, seeds):
    """Concatenated Fibonacci segments: each segment restarts from its
    own seed pair, so the transition INTO each restart row violates the
    fib AIR (exactly what an exemption permits)."""
    rows = []
    for a0, b0 in seeds:
        a, b = FieldElement(a0), FieldElement(b0)
        rows.append([a, b])
        for _ in range(seg_len - 1):
            a, b = a + b, a
            rows.append([a, b])
    return rows


def _stark(trace_len, exemptions, seed=5, **kw):
    return Stark(
        4, 2, 2, 2, trace_len,
        rng=DeterministicRandom(seed),
        degree_target="fri",
        transition_exemptions=exemptions,
        **kw,
    )


SEEDS = [(1, 1), (17, 3), (1000, 1)]
SEG = 8
TRACE = _segmented_trace(SEG, SEEDS)
EXEMPT = [SEG - 1, 2 * SEG - 1]  # transitions into the restart rows


def _boundary(trace):
    return [
        (0, 0, trace[0][0]),
        (0, 1, trace[0][1]),
        (len(trace) - 1, 0, trace[-1][0]),
    ]


def test_exempted_restarts_prove_and_verify():
    air = FibonacciAir(1).transition_constraints()
    stark = _stark(len(TRACE), EXEMPT)
    boundary = _boundary(TRACE)
    proof = stark.prove(TRACE, air, boundary)
    assert stark.verify(proof, air, boundary)
    # the verifier must share the exemption list (it is part of the
    # statement): a verifier without it rejects
    plain = _stark(len(TRACE), ())
    assert not plain.verify(proof, air, boundary)


def test_mismatched_exemption_list_rejects():
    """Exemptions are statement parameters (like expansion_factor):
    nothing in the proof bytes encodes them, so a verifier configured
    with a DIFFERENT exemption list checks a different statement and
    must reject an honest proof for this one."""
    air = FibonacciAir(1).transition_constraints()
    stark = _stark(len(TRACE), EXEMPT)
    boundary = _boundary(TRACE)
    proof = stark.prove(TRACE, air, boundary)
    assert stark.verify(proof, air, boundary)
    # superset list (one extra exempted cycle)
    superset = _stark(len(TRACE), EXEMPT + [3])
    assert not superset.verify(proof, air, boundary)
    # disjoint list of the same size
    shifted = _stark(len(TRACE), [SEG, 2 * SEG])
    assert not shifted.verify(proof, air, boundary)


def test_unexempted_restart_breaks_the_prover():
    air = FibonacciAir(1).transition_constraints()
    stark = _stark(len(TRACE), ())
    with pytest.raises(ValueError):
        stark.prove(TRACE, air, _boundary(TRACE))


def test_violation_at_non_exempt_cycle_still_caught():
    air = FibonacciAir(1).transition_constraints()
    bad = [list(r) for r in TRACE]
    bad[3][0] = bad[3][0] + FieldElement(1)  # inside segment 0
    stark = _stark(len(bad), EXEMPT)
    with pytest.raises(ValueError):
        stark.prove(bad, air, _boundary(bad))


def test_degree_bookkeeping_counts_exemptions():
    air = FibonacciAir(1).transition_constraints()
    plain = _stark(len(TRACE), ())
    ex = _stark(len(TRACE), EXEMPT)
    assert (
        ex.transition_zeroifier_degree()
        == plain.transition_zeroifier_degree() - len(EXEMPT)
    )
    assert ex.transition_zeroifier().degree() == ex.transition_zeroifier_degree()
    d_plain = plain.transition_quotient_degree_bounds(air)
    d_ex = ex.transition_quotient_degree_bounds(air)
    assert all(b - a == len(EXEMPT) for a, b in zip(d_plain, d_ex))


def test_evaluation_and_symbolic_transcripts_match():
    air = FibonacciAir(1).transition_constraints()
    boundary = _boundary(TRACE)
    p_eval = _stark(len(TRACE), EXEMPT, seed=9).prove(TRACE, air, boundary)
    p_sym = _stark(len(TRACE), EXEMPT, seed=9, algorithm="symbolic").prove(
        TRACE, air, boundary
    )
    assert p_eval == p_sym


def test_tz_eval_batch_matches_polynomial_eval():
    # force the vectorized path (trace > 64) and compare against the
    # filtered polynomial's Horner evaluation at coset points
    seg, nseg = 16, 6
    trace = _segmented_trace(seg, [(i + 1, 2 * i + 1) for i in range(nseg)])
    exempt = [seg * (k + 1) - 1 for k in range(nseg - 1)]
    stark = _stark(len(trace), exempt)
    xs = [stark.generator * stark.omega.pow(i) for i in (0, 3, 11, 57)]
    tz = stark.transition_zeroifier()
    assert stark._tz_eval_batch(xs) == [tz.eval(x) for x in xs]


def test_exemption_validation():
    with pytest.raises(ValueError):
        _stark(24, [23])  # out of range: last transition is 22 -> 23
    with pytest.raises(ValueError):
        _stark(24, [-1])
