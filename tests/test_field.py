"""Field golden-model tests (mirrors reference: field.rs:156-277)."""

import random

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.params import GENERATOR, OMICRON_128, P


def test_modulus_value():
    # The code's prime (reference: field.rs:32), NOT the README's claim.
    assert P == 270497897142230380135924736767050121217
    assert P == 407 * 2**119 + 1


def test_addition_wraparound():
    a = FieldElement(P - 1)
    b = FieldElement(10)
    assert a + b == FieldElement(9)


def test_subtraction_wraparound():
    a = FieldElement(P - 1)
    b = FieldElement(10)
    assert a - b == FieldElement(P - 11)
    assert FieldElement(2) - FieldElement(3) == FieldElement(P - 1)


def test_inverse():
    elem = FieldElement(3)
    assert elem * elem.inverse() == FieldElement.one()
    for val in [1, 2, 3, 5, 1234567, 3221225470]:
        e = FieldElement(val)
        assert e * e.inverse() == FieldElement.one()
    with pytest.raises(ZeroDivisionError):
        FieldElement.zero().inverse()


def test_pow():
    assert FieldElement(2).pow(32) == FieldElement(2**32 % P)
    assert FieldElement(2) ** 0 == FieldElement.one()


def test_division():
    a = FieldElement(123456789)
    b = FieldElement(987654321)
    assert (a / b) * b == a


def test_negation():
    a = FieldElement(5)
    assert -a == FieldElement(P - 5)
    assert a + (-a) == FieldElement.zero()


def test_primitive_nth_root():
    root = FieldElement.primitive_nth_root(16)
    assert root.pow(16) == FieldElement.one()
    assert root.pow(8) != FieldElement.one()


def test_primitive_nth_root_rejects_bad_n():
    with pytest.raises(ValueError):
        FieldElement.primitive_nth_root(3)
    with pytest.raises(ValueError):
        FieldElement.primitive_nth_root(1 << 120)


def test_omicron_golden_values():
    # reference: stark.rs:65 hardcoded assert + field.rs:230-246 printouts
    omicron = FieldElement.primitive_nth_root(128)
    assert omicron.value == OMICRON_128
    assert omicron.pow(0) == FieldElement.one()
    assert omicron.pow(2).value == 59478736836296470922896375673044043947


def test_generator_order():
    g = FieldElement(GENERATOR)
    assert g.pow(2**119) == FieldElement.one()
    assert g.pow(2**118) != FieldElement.one()


def test_sample():
    rng = random.Random(1234)
    for _ in range(20):
        data = bytes(rng.randrange(256) for _ in range(32))
        elem = FieldElement.sample(data)
        assert 0 <= elem.value < P
        assert elem.value == int.from_bytes(data, "big") % P


def test_sample_empty_and_short():
    assert FieldElement.sample(b"").value == 0
    assert FieldElement.sample(b"\x07").value == 7
