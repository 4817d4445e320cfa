"""Rescue-Prime tests: golden vectors, trace boundaries, AIR satisfaction,
fault injection (mirrors reference: rescue_prime.rs:410-571)."""

import random

from stark_tpu.field import FieldElement
from stark_tpu.params import P
from stark_tpu.rescue_prime import RescuePrime


def test_golden_hashes():
    rp = RescuePrime()
    assert rp.hash(FieldElement.one()) == FieldElement(
        244180265933090377212304188905974087294
    )
    assert rp.hash(
        FieldElement(57322816861100832358702415967512842988)
    ) == FieldElement(89633745865384635541695204788332415101)


def test_trace_boundaries():
    rp = RescuePrime()
    a = FieldElement(57322816861100832358702415967512842988)
    b = FieldElement(89633745865384635541695204788332415101)
    trace = rp.trace(a)
    assert len(trace) == rp.N + 1
    assert all(len(row) == rp.m for row in trace)
    assert trace[0][0] == a
    assert trace[0][1] == FieldElement.zero()
    assert trace[-1][0] == b


def test_boundary_constraints_hold():
    rp = RescuePrime()
    inp = FieldElement(12345)
    out = rp.hash(inp)
    trace = rp.trace(inp)
    for (cycle, register, value) in rp.boundary_constraints(out):
        assert trace[cycle][register] == value


def test_transition_constraints_hold_on_honest_trace():
    rp = RescuePrime()
    omicron = FieldElement.primitive_nth_root(1 << 119)
    inp = FieldElement(57322816861100832358702415967512842988)
    trace = rp.trace(inp)
    air = rp.transition_constraints(omicron)
    assert len(air) == rp.m
    for o in range(len(trace) - 1):
        point = (
            [omicron.pow(o)]
            + [trace[o][0], trace[o][1]]
            + [trace[o + 1][0], trace[o + 1][1]]
        )
        for air_poly in air:
            assert air_poly.eval(point) == FieldElement.zero(), f"cycle {o}"


def test_fault_injection_detected():
    """Random single-cell perturbations must violate some constraint
    (reference: rescue_prime.rs:484-567, incl. the pinned deterministic
    case register=1, cycle=22)."""
    rp = RescuePrime()
    omicron = FieldElement.primitive_nth_root(1 << 119)
    inp = FieldElement(57322816861100832358702415967512842988)
    out = rp.hash(inp)
    trace = rp.trace(inp)
    air = rp.transition_constraints(omicron)
    boundary = rp.boundary_constraints(out)
    rng = random.Random(1717)

    cases = [(1, 22, FieldElement(17274817952119230544216945715808633996))]
    while len(cases) < 10:
        value = FieldElement(rng.randrange(P))
        if value.is_zero():
            continue
        cases.append((rng.randrange(rp.m), rng.randrange(rp.N + 1), value))

    for register_index, cycle_index, value in cases:
        trace[cycle_index][register_index] = (
            trace[cycle_index][register_index] + value
        )
        noticed = False
        for (cycle, register, bval) in boundary:
            if trace[cycle][register] != bval:
                noticed = True
                break
        if not noticed:
            for o in range(len(trace) - 1):
                point = (
                    [omicron.pow(o)]
                    + [trace[o][0], trace[o][1]]
                    + [trace[o + 1][0], trace[o + 1][1]]
                )
                if any(a.eval(point) != FieldElement.zero() for a in air):
                    noticed = True
                    break
        assert noticed, (
            f"perturbation not noticed: cycle={cycle_index} "
            f"register={register_index} value={value.value}"
        )
        # restore
        trace[cycle_index][register_index] = (
            trace[cycle_index][register_index] - value
        )


def test_round_constant_polynomials_interpolate():
    rp = RescuePrime()
    omicron = FieldElement.primitive_nth_root(128)
    first, second = rp.round_constants_polynomials(omicron)
    assert len(first) == rp.m and len(second) == rp.m
    # check the interpolants reproduce the round constants at omicron^r
    for r in range(rp.N):
        x = omicron.pow(r)
        for i in range(rp.m):
            point = [x]
            assert first[i].eval(point).value == rp.round_constants[2 * r * rp.m + i]
            assert (
                second[i].eval(point).value
                == rp.round_constants[2 * r * rp.m + rp.m + i]
            )
