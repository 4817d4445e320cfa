"""Geometric-progression interpolation/evaluation (Bostan-Schost chirp)."""

import random
import time

from stark_tpu.field import FieldElement
from stark_tpu.geometric import (
    detect_ratio,
    geometric_evaluate,
    geometric_interpolate,
)
from stark_tpu.params import P
from stark_tpu.poly import Polynomial, _lagrange_newton


def test_detect_ratio():
    om = FieldElement.primitive_nth_root(64).value
    xs = [pow(om, i, P) for i in range(10)]
    assert detect_ratio(xs) == om
    assert detect_ratio([1, 2, 4, 9]) is None
    assert detect_ratio([0, 1, 2]) is None
    assert detect_ratio([5 * pow(om, i, P) % P for i in range(8)]) == om


def test_interpolate_matches_newton():
    rng = random.Random(1)
    om = FieldElement.primitive_nth_root(128).value
    for n, start in [(3, 1), (17, 1), (36, 1), (36, 9), (60, 123456)]:
        xs = [start * pow(om, i, P) % P for i in range(n)]
        ys = [rng.randrange(P) for _ in range(n)]
        got = Polynomial(geometric_interpolate(xs, ys))
        want = Polynomial(_lagrange_newton(xs, ys))
        assert got == want, (n, start)


def test_evaluate_matches_horner():
    rng = random.Random(2)
    om = FieldElement.primitive_nth_root(256).value
    coeffs = [rng.randrange(P) for _ in range(40)]
    p = Polynomial(coeffs)
    got = geometric_evaluate(coeffs, 7, om, 25)
    assert got == [p.eval(7 * pow(om, t, P) % P).value for t in range(25)]


def test_lagrange_dispatches_to_geometric():
    """Polynomial.lagrange uses the O(n log n) path for large geometric
    domains — and produces the same interpolant."""
    rng = random.Random(3)
    om = FieldElement.primitive_nth_root(1 << 10).value
    n = 260
    xs = [pow(om, i, P) for i in range(n)]
    ys = [rng.randrange(P) for _ in range(n)]
    poly = Polynomial.lagrange(xs, ys)
    for i in [0, 1, 100, n - 1]:
        assert poly.eval(xs[i]).value == ys[i]
    assert poly.degree() <= n - 1


def test_geometric_zeroifier_matches_product():
    from stark_tpu.geometric import geometric_zeroifier

    rng = random.Random(4)
    om = FieldElement.primitive_nth_root(1 << 11).value
    for n, start in [(1, 1), (5, 1), (40, 1), (40, 777), (100, 3)]:
        xs = [start * pow(om, i, P) % P for i in range(n)]
        # O(n^2) incremental reference product
        acc = [1]
        for x in xs:
            nxt = [0] + acc
            for i in range(len(acc)):
                nxt[i] = (nxt[i] - x * acc[i]) % P
            acc = nxt
        got = geometric_zeroifier(start, om, n)
        assert got == acc, (n, start)
        # and the auto-dispatching Polynomial path agrees and vanishes
        z = Polynomial.zeroifier_domain(xs)
        assert z == Polynomial(acc)
        assert z.eval(xs[0]).value == 0
