"""Polynomial tests (mirrors reference: univariate_poly.rs:503-869).

Note: this framework stores coefficients lowest-degree first; the
reference's fixed vectors (written highest-first) are reversed here.
"""

import random

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.params import P
from stark_tpu.poly import Polynomial


def test_coefficient_order():
    # [0, 1] lowest-first is the polynomial x
    assert Polynomial([0, 1]).eval(2).value == 2
    # 3x + 5
    assert Polynomial([5, 3]).eval(2).value == 11
    # x^2 + 2x + 3
    assert Polynomial([3, 2, 1]).eval(2).value == 11


def test_eval():
    # reference vector: [10, 3, 1] highest-first = 10x^2 + 3x + 1
    poly = Polynomial([1, 3, 10])
    assert poly.eval(2).value == 47


def test_distributivity():
    a = Polynomial([2, 1, 0])
    b = Polynomial([1, 2, 2])
    c = Polynomial([1, 5, 5, 2, 5, 0])
    assert a * (b + c) == a * b + a * c


def test_add_same_degree():
    p1 = Polynomial([1, 3, 10])
    p2 = Polynomial([1, 3, 90])
    s = p1 + p2
    assert s.coeffs[:3] == [2, 6, 100]


def test_sub_same_degree():
    p1 = Polynomial([1, 6, 80])
    p2 = Polynomial([6, 3, 40])
    d = p1 - p2
    assert d.coeffs[:3] == [P - 5, 3, 40]


def test_sub_larger_lhs():
    lhs = Polynomial([1, 6, 80, 1, 6, 80])
    rhs = Polynomial([6, 3, 40])
    d = lhs - rhs
    assert d.coeffs == [P - 5, 3, 40, 1, 6, 80]


def test_sub_larger_rhs():
    lhs = Polynomial([6, 3, 40])
    rhs = Polynomial([1, 6, 80, 1, 6, 80])
    d = lhs - rhs
    assert d.coeffs == [5, P - 3, P - 40, P - 1, P - 6, P - 80]


def test_mul():
    # reference: (10x^3 + x^2 + 1)(3x^2 + x + 17) at x=2 -> 2635
    p1 = Polynomial([1, 0, 1, 10])
    p2 = Polynomial([17, 1, 3])
    assert (p1 * p2).eval(2).value == 2635


def test_negate():
    poly = Polynomial([1, 3, 10])
    assert (-poly).eval(9).value == P - 838


def test_div_exact():
    a = Polynomial([2, 1])
    b = Polynomial([1, 1])
    c = a * b
    assert c / a == b
    assert c / b == a


def test_div_identity_with_remainder():
    # q * d + r == n must hold for inexact division
    numerator = Polynomial([1, 2, 3])
    denominator = Polynomial([1, 1])
    q, r = numerator.divmod(denominator)
    assert q * denominator + r == numerator
    # the reference's Div drops the remainder; ours does too
    assert numerator / denominator == q


def test_div_zero_denominator():
    with pytest.raises(ZeroDivisionError):
        Polynomial([1]) / Polynomial([0])


def test_div_lower_degree_numerator():
    assert Polynomial([1, 1]) / Polynomial([0, 0, 1]) == Polynomial.zero()


def test_degree_semantics():
    assert Polynomial([0]).degree() == 0  # zero polynomial -> 0 (quirk)
    assert Polynomial([]).degree() == 0
    assert Polynomial([5]).degree() == 0
    assert Polynomial([0, 1]).degree() == 1
    assert Polynomial([0, 1, 0, 0]).degree() == 1  # trailing zeros ignored


def test_zeroifier_fuzz():
    rng = random.Random(42)
    vanish_at = [rng.randrange(P) for _ in range(10)]
    z = Polynomial.zeroifier_domain(vanish_at)
    for x in vanish_at:
        assert z.eval(x).value == 0
    assert z.degree() == 10
    assert z.eval(vanish_at[0] + 1).value != 0


def test_zeroifier_product_tree_matches_incremental():
    """The >1024-point product-tree path must produce the SAME polynomial
    as the incremental product (exact GF(p) products are association-
    independent) — exercised on a random non-geometric domain just past
    the threshold, compared against a sub-threshold incremental rebuild."""
    rng = random.Random(7)
    vanish_at = [rng.randrange(P) for _ in range(1030)]
    z_tree = Polynomial.zeroifier_domain(vanish_at)  # product-tree path
    # incremental ground truth (threshold-independent re-derivation)
    acc = [1]
    for dv in vanish_at:
        nxt = [0] + acc
        for i in range(len(acc)):
            nxt[i] = (nxt[i] - dv * acc[i]) % P
        acc = nxt
    assert z_tree.coeffs[: len(acc)] == acc
    assert z_tree.degree() == 1030
    for x in vanish_at[:5]:
        assert z_tree.eval(x).value == 0


def test_colinearity():
    assert Polynomial.test_colinearity([(0, 0), (1, 1), (2, 2)])
    assert not Polynomial.test_colinearity([(0, 0), (1, 1), (2, 5)])
    # a constant line has degree 0, not 1
    assert not Polynomial.test_colinearity([(0, 7), (1, 7), (2, 7)])


def test_lagrange_fuzz():
    rng = random.Random(17)
    xs = [0, 1, 2]
    ys = [rng.randrange(P) for _ in range(3)]
    poly = Polynomial.lagrange(xs, ys)
    for x, y in zip(xs, ys):
        assert poly.eval(x).value == y


def test_lagrange_random_domain():
    rng = random.Random(23)
    xs = list({rng.randrange(P) for _ in range(12)})
    ys = [rng.randrange(P) for _ in range(len(xs))]
    poly = Polynomial.lagrange(xs, ys)
    assert poly.degree() <= len(xs) - 1
    for x, y in zip(xs, ys):
        assert poly.eval(x).value == y


def test_lagrange_ntt_matches_traditional():
    # power-of-two root-of-unity domain takes the NTT path; verify against
    # direct evaluation (reference: univariate_poly.rs:820-868)
    n = 16
    omega = FieldElement.primitive_nth_root(n)
    domain = [omega.pow(i) for i in range(n)]
    test_poly = Polynomial([1, 2, 3])
    evaluations = test_poly.eval_domain(domain)
    back = Polynomial.lagrange(domain, evaluations)
    assert back == test_poly


def test_eval_domain_ntt_matches_horner():
    n = 32
    omega = FieldElement.primitive_nth_root(n)
    domain = [omega.pow(i) for i in range(n)]
    poly = Polynomial([4, 3, 2, 1])
    ntt_evals = poly.eval_domain(domain)
    for i, x in enumerate(domain):
        assert ntt_evals[i] == poly.eval(x)


def test_compose():
    # p(x) = x^2 + 1, q(x) = 2x + 3; p(q(x)) = 4x^2 + 12x + 10
    p = Polynomial([1, 0, 1])
    q = Polynomial([3, 2])
    assert p.compose(q) == Polynomial([10, 12, 4])


def test_scale_argument_matches_compose():
    rng = random.Random(5)
    p = Polynomial([rng.randrange(P) for _ in range(20)])
    factor = rng.randrange(1, P)
    assert p.scale_argument(factor) == p.compose(Polynomial([0, factor]))


def test_pow():
    p = Polynomial([1, 1])  # 1 + x
    assert p.pow(2) == Polynomial([1, 2, 1])
    assert p.pow(0) == Polynomial.one()
    assert Polynomial.zero().pow(5) == Polynomial.zero()


def test_save_load(tmp_path):
    poly = Polynomial([1, 2, 3, P - 1])
    path = str(tmp_path / "poly.json")
    poly.save(path)
    assert Polynomial.load(path) == poly
