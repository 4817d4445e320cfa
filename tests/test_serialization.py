"""Wire-format tests: bincode/serde_json byte compatibility."""

from stark_tpu.field import FieldElement
from stark_tpu.params import P
from stark_tpu.serialization import (
    bincode_field_element,
    bincode_parse_string_vec,
    bincode_string_vec,
    json_field_element,
    json_field_element_vec,
    json_hash_path,
    json_parse_field_element,
    json_parse_field_element_vec,
    json_parse_hash_path,
    json_parse_string_triple,
    json_string_triple,
    u32_digits,
)


def test_u32_digits():
    assert u32_digits(0) == []
    assert u32_digits(1) == [1]
    assert u32_digits(2**32) == [0, 1]
    assert u32_digits(2**32 + 5) == [5, 1]


def test_bincode_field_element_zero():
    # Sign::NoSign = variant 1 as u32 LE; empty digit vec (u64 LE len 0)
    assert bincode_field_element(0) == (1).to_bytes(4, "little") + (0).to_bytes(
        8, "little"
    )


def test_bincode_field_element_small():
    # Sign::Plus = variant 2; one digit
    assert bincode_field_element(7) == (
        (2).to_bytes(4, "little") + (1).to_bytes(8, "little") + (7).to_bytes(4, "little")
    )


def test_bincode_field_element_large():
    v = P - 1
    enc = bincode_field_element(v)
    assert enc[:4] == (2).to_bytes(4, "little")
    ndigits = int.from_bytes(enc[4:12], "little")
    assert ndigits == 4  # 128-bit value -> 4 u32 digits
    digits = [
        int.from_bytes(enc[12 + 4 * i : 16 + 4 * i], "little") for i in range(ndigits)
    ]
    val = 0
    for i, d in enumerate(digits):
        val |= d << (32 * i)
    assert val == v
    assert len(enc) == 12 + 4 * ndigits


def test_json_field_element():
    assert json_field_element(0) == '{"value":["NoSign",[]]}'
    assert json_field_element(7) == '{"value":["Plus",[7]]}'
    two32 = 2**32
    assert json_field_element(two32) == '{"value":["Plus",[0,1]]}'
    for v in [0, 1, 123456789, P - 1]:
        assert json_parse_field_element(json_field_element(v)) == FieldElement(v)


def test_json_field_element_vec():
    xs = [0, 1, P - 1]
    s = json_field_element_vec(xs)
    parsed = json_parse_field_element_vec(s)
    assert [fe.value for fe in parsed] == [x % P for x in xs]
    assert " " not in s  # serde_json emits no whitespace


def test_json_string_triple():
    s = json_string_triple("1", "22", "333")
    assert s == '["1","22","333"]'
    assert json_parse_string_triple(s) == ("1", "22", "333")


def test_json_hash_path():
    path = [bytes(range(32)), bytes(31, ) * 0 + bytes([255] * 32)]
    s = json_hash_path(path)
    assert json_parse_hash_path(s) == path
    assert s.startswith("[[0,1,2,")


def test_bincode_parse_rejects_malformed():
    import pytest

    # hostile count field must not drive a huge loop/allocation
    with pytest.raises(ValueError):
        bincode_parse_string_vec(b"not a proof")
    with pytest.raises(ValueError):
        bincode_parse_string_vec(b"\xff" * 8)
    with pytest.raises(ValueError):
        bincode_parse_string_vec((1).to_bytes(8, "little") + (99).to_bytes(8, "little"))
    with pytest.raises(ValueError):
        bincode_parse_string_vec(b"\x01")
    # trailing bytes rejected
    with pytest.raises(ValueError):
        bincode_parse_string_vec(bincode_string_vec(["a"]) + b"x")


def test_bincode_string_vec_round_trip():
    strings = ["", "hello", "deadbeef" * 8, "x" * 1000]
    assert bincode_parse_string_vec(bincode_string_vec(strings)) == strings
