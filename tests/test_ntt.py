"""Host NTT tests (mirrors reference: ntt.rs:138-207, plus coset paths)."""

import random

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.ntt import NTT
from stark_tpu.params import GENERATOR, P


def test_round_trip_basic():
    ntt = NTT(4)
    coeffs = [1, 2, 3, 4]
    assert ntt.interpolate(ntt.evaluate(coeffs)) == coeffs


def test_forward_matches_dft():
    n = 8
    ntt = NTT(n)
    rng = random.Random(7)
    coeffs = [rng.randrange(P) for _ in range(n)]
    evals = ntt.evaluate(coeffs)
    omega = ntt.omega.value
    for k in range(n):
        x = pow(omega, k, P)
        expected = 0
        for j in reversed(range(n)):
            expected = (expected * x + coeffs[j]) % P
        assert evals[k] == expected


def test_interpolate_then_evaluate_fixpoint():
    n = 8
    ntt = NTT(n)
    evaluations = [(i * i + 1) % P for i in range(n)]
    coeffs = ntt.interpolate(evaluations)
    assert ntt.evaluate(coeffs) == evaluations


def test_multiply():
    ntt = NTT(8)
    # (1 + x)(1 + 2x) = 1 + 3x + 2x^2  (coefficients lowest-first)
    result = ntt.multiply([1, 1], [1, 2])
    assert result == [1, 3, 2]


def test_round_trip_sizes():
    rng = random.Random(99)
    for logn in [4, 6, 8, 10]:
        n = 1 << logn
        ntt = NTT(n)
        coeffs = [rng.randrange(P) for _ in range(n)]
        assert ntt.interpolate(ntt.evaluate(coeffs)) == coeffs


def test_coset_round_trip():
    n = 64
    ntt = NTT(n)
    rng = random.Random(3)
    coeffs = [rng.randrange(P) for _ in range(n)]
    evals = ntt.coset_evaluate(coeffs, GENERATOR)
    back = ntt.coset_interpolate(evals, GENERATOR)
    assert back == coeffs


def test_coset_evaluate_matches_horner():
    n = 16
    ntt = NTT(n)
    rng = random.Random(5)
    coeffs = [rng.randrange(P) for _ in range(n)]
    offset = GENERATOR
    evals = ntt.coset_evaluate(coeffs, offset)
    omega = ntt.omega.value
    for i in range(n):
        x = offset * pow(omega, i, P) % P
        expected = 0
        for c in reversed(coeffs):
            expected = (expected * x + c) % P
        assert evals[i] == expected


def test_rejects_bad_sizes():
    with pytest.raises(ValueError):
        NTT(3)
    with pytest.raises(ValueError):
        NTT(1 << 31)
    ntt = NTT(8)
    with pytest.raises(ValueError):
        ntt.forward([1, 2, 3])


def test_round_trip_large():
    """2^14 round-trip (the BASELINE grid asks for 2^10..2^20; larger sizes
    run on device, differential-tested in test_device_ntt / TPU drives)."""
    rng = random.Random(14)
    n = 1 << 14
    ntt = NTT(n)
    coeffs = [rng.randrange(P) for _ in range(n)]
    assert ntt.interpolate(ntt.evaluate(coeffs)) == coeffs
