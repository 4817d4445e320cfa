"""Multivariate polynomial tests (mirrors reference:
multivariate_poly.rs:241-304)."""

from stark_tpu.field import FieldElement
from stark_tpu.mpoly import MPolynomial
from stark_tpu.poly import Polynomial


def test_evaluate():
    v = MPolynomial.variables(4)
    mpoly1 = (
        MPolynomial.constant(1) * v[0]
        + MPolynomial.constant(2) * v[1]
        + MPolynomial.constant(5) * v[2].pow(3)
    )
    mpoly2 = (
        MPolynomial.constant(1) * v[0] * v[3]
        + MPolynomial.constant(5) * v[3].pow(3)
        + MPolynomial.constant(5)
    )
    mpoly3 = mpoly1 * mpoly2
    point = [FieldElement(x) for x in [0, 5, 5, 2]]

    eval1 = mpoly1.eval(point)
    eval2 = mpoly2.eval(point)
    eval3 = mpoly3.eval(point)
    assert eval1.value == 635
    assert eval2.value == 45
    assert eval3.value == 28575
    assert eval1 * eval2 == eval3
    assert eval1 + eval2 == (mpoly1 + mpoly2).eval(point)


def test_lift():
    upoly = Polynomial.lagrange(
        [0, 1, 2],
        [2, 5, 5],
    )
    mpoly = MPolynomial.lift(upoly, 3)

    # golden coefficients (reference: multivariate_poly.rs:294-296)
    assert mpoly.dict[(0,)] == 2
    assert mpoly.dict[(0, 0, 0, 1)] == 135248948571115190067962368383525060613
    assert mpoly.dict[(0, 0, 0, 2)] == 135248948571115190067962368383525060607

    upoly_eval = upoly.eval(5)
    mpoly_eval = mpoly.eval(
        [FieldElement.zero()] * 3 + [FieldElement(5)]
    )
    assert upoly_eval == mpoly_eval


def test_lift_zero():
    assert MPolynomial.lift(Polynomial.zero(), 2).is_zero()


def test_eval_symbolic():
    # f(x, y) = x*y + 2; substitute x -> t^2, y -> t + 1
    v = MPolynomial.variables(2)
    f = v[0] * v[1] + MPolynomial.constant(2)
    t2 = Polynomial([0, 0, 1])
    t1 = Polynomial([1, 1])
    composed = f.eval_symbolic([t2, t1])
    # t^2 * (t+1) + 2 = t^3 + t^2 + 2
    assert composed == Polynomial([2, 0, 1, 1])


def test_pow_and_arithmetic():
    v = MPolynomial.variables(2)
    f = v[0] + v[1]
    sq = f.pow(2)
    point = [FieldElement(3), FieldElement(4)]
    assert sq.eval(point).value == 49
    assert (f - f).is_zero()
    assert (-f + f).is_zero()
    assert f.pow(0).eval(point) == FieldElement.one()
    assert MPolynomial.zero().pow(5).is_zero()


def test_mixed_arity_mul():
    a = MPolynomial({(1,): 1})  # x
    b = MPolynomial({(0, 1): 1})  # y
    prod = a * b
    assert prod.eval([FieldElement(3), FieldElement(5)]).value == 15
