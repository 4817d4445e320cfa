"""Round-4 statement-cache and batched-extension seams.

The shared statement tables, the batched RS-extension and the
verify-only point evaluation are pure performance seams — these tests
pin their outputs against the unbatched/uncached golden paths."""

import random

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.fibonacci import FibonacciAir
from stark_tpu.mpoly import MPolynomial
from stark_tpu.params import P
from stark_tpu.poly import Polynomial
from stark_tpu.rescue_prime import RescuePrime
from stark_tpu.rng import DeterministicRandom
from stark_tpu.stark import Stark


def _small_stark(seed=5):
    rp = RescuePrime()
    return rp, Stark(4, 2, 2, rp.m, rp.N + 1, rng=DeterministicRandom(seed))


def test_rs_extend_rows_matches_per_poly():
    rp, stark = _small_stark()
    fri_domain = stark.fri.eval_domain()
    rng = random.Random(3)
    rows = [
        [rng.randrange(P) for _ in range(rng.randrange(1, 40))]
        for _ in range(5)
    ]
    batched = stark._rs_extend_rows(rows, fri_domain)
    for row, got in zip(rows, batched):
        want = stark._rs_extend(Polynomial(list(row)), fri_domain)
        assert got == want


def test_rs_extend_rows_nonstandard_domain_fallback():
    # a reversed domain defeats the standard-coset fast path; the batch
    # helper must fall back to per-polynomial evaluation, same values
    rp, stark = _small_stark()
    fri_domain = list(reversed(stark.fri.eval_domain()))
    rng = random.Random(4)
    rows = [[rng.randrange(P) for _ in range(8)] for _ in range(2)]
    batched = stark._rs_extend_rows(rows, fri_domain)
    for row, got in zip(rows, batched):
        assert got == [
            fe.value for fe in Polynomial(list(row)).eval_domain(fri_domain)
        ]


def test_air_group_point_values_match_extension():
    rp, stark = _small_stark()
    fri_domain = stark.fri.eval_domain()
    air = rp.transition_constraints(stark.omicron)
    indices = [0, 3, 17, 100, 511]
    for tc in air:
        groups_ext = stark._air_groups_extended(tc, fri_domain)
        point_vals = stark._air_group_point_values(tc, indices)
        assert len(groups_ext) == len(point_vals)
        ext_by_tail = {tail: cw for tail, cw in groups_ext}
        for tail, vals in point_vals:
            cw = ext_by_tail[tail]
            assert vals == {i: cw[i] for i in indices}


def test_shared_tables_hit_across_instances():
    rp, s1 = _small_stark(seed=1)
    _, s2 = _small_stark(seed=2)
    fri_domain = s1.fri.eval_domain()
    air = rp.transition_constraints(s1.omicron)
    a = s1._air_groups_extended(air[0], fri_domain)
    b = s2._air_groups_extended(air[0], fri_domain)
    assert a is b  # same statement shape -> same process-wide table


def test_degree_bound_cache_guards_mutation():
    air = FibonacciAir(1).transition_constraints()
    stark = Stark(4, 2, 2, 2, 24, rng=DeterministicRandom(9),
                  degree_target="fri")
    before = stark.transition_degree_bounds(air)
    # mutate a constraint with a higher-degree monomial: the term-count
    # guard must invalidate the cached bound
    tc = air[0]
    tc.dict[(0, 9, 0, 0, 0)] = 1  # degree 9 * randomized_trace_degree
    after = stark.transition_degree_bounds(air)
    assert after[0] > before[0]


def test_content_key_stable_and_freezes():
    air = FibonacciAir(1).transition_constraints()
    tc = air[0]
    k1 = tc.content_key()
    assert tc.content_key() == k1
    # serving the fingerprint freezes the polynomial: an in-place
    # mutation would silently poison the process-wide statement caches,
    # so it must fail loudly instead (same-count rewrites included)
    with pytest.raises(TypeError):
        tc.dict[(8, 0, 0, 0, 0)] = 5
    with pytest.raises(TypeError):
        tc.dict[next(iter(tc.dict))] = 1
    with pytest.raises(TypeError):
        tc.dict.pop(next(iter(tc.dict)))
    assert tc.content_key() == k1
    # a structurally different polynomial still gets a different key
    other = FibonacciAir(1).transition_constraints()[0] + MPolynomial(
        {(8, 0, 0, 0, 0): 5}
    )
    assert other.content_key() != k1
