"""Differential tests: device (JAX limb/Montgomery) vs host golden model."""

import random

import numpy as np
import pytest

from stark_tpu.ops import field_ops as fo
from stark_tpu.ops.limbs import pack, unpack
from stark_tpu.params import GENERATOR, P, R_MOD_P, RESCUE_ALPHA_INV


def _rand_values(rng, n):
    vals = [rng.randrange(P) for _ in range(n - 4)]
    # always include edge cases
    vals += [0, 1, P - 1, P - 2]
    return vals


def test_pack_unpack_round_trip():
    rng = random.Random(0)
    vals = _rand_values(rng, 64)
    assert unpack(pack(vals)) == vals


def test_add_sub_neg():
    rng = random.Random(1)
    a_vals = _rand_values(rng, 128)
    b_vals = _rand_values(rng, 128)
    rng.shuffle(b_vals)
    a, b = pack(a_vals), pack(b_vals)
    assert unpack(fo.add(a, b)) == [(x + y) % P for x, y in zip(a_vals, b_vals)]
    assert unpack(fo.sub(a, b)) == [(x - y) % P for x, y in zip(a_vals, b_vals)]
    assert unpack(fo.neg(a)) == [(-x) % P for x in a_vals]


def test_mont_round_trip():
    rng = random.Random(2)
    vals = _rand_values(rng, 64)
    a = pack(vals)
    am = fo.to_mont(a)
    assert unpack(am) == [v * R_MOD_P % P for v in vals]
    assert unpack(fo.from_mont(am)) == vals


def test_mont_mul():
    rng = random.Random(3)
    a_vals = _rand_values(rng, 256)
    b_vals = _rand_values(rng, 256)
    rng.shuffle(b_vals)
    am = fo.to_mont(pack(a_vals))
    bm = fo.to_mont(pack(b_vals))
    prod = fo.from_mont(fo.mont_mul(am, bm))
    assert unpack(prod) == [x * y % P for x, y in zip(a_vals, b_vals)]


def test_mont_sqr():
    rng = random.Random(4)
    vals = _rand_values(rng, 64)
    am = fo.to_mont(pack(vals))
    assert unpack(fo.from_mont(fo.mont_sqr(am))) == [v * v % P for v in vals]


def test_pow_fixed():
    rng = random.Random(5)
    vals = _rand_values(rng, 32)
    a = pack(vals)
    for exp in [0, 1, 2, 3, 5, 1 << 20, RESCUE_ALPHA_INV]:
        got = unpack(fo.pow_plain(a, exp))
        want = [pow(v, exp, P) for v in vals]
        assert got == want, f"exponent {exp}"


def test_mont_inv():
    rng = random.Random(6)
    vals = [rng.randrange(1, P) for _ in range(60)] + [1, P - 1, GENERATOR]
    am = fo.to_mont(pack(vals))
    inv = fo.from_mont(fo.mont_inv(am))
    assert unpack(inv) == [pow(v, -1, P) for v in vals]


def test_mont_inv_zero_maps_to_zero():
    a = fo.to_mont(pack([0, 5]))
    out = unpack(fo.from_mont(fo.mont_inv(a)))
    assert out[0] == 0
    assert out[1] == pow(5, -1, P)


def test_is_zero():
    a = pack([0, 1, P - 1, 0])
    assert list(np.asarray(fo.is_zero(a))) == [True, False, False, True]


def test_mul_matches_generator_powers():
    # chain multiplication stays exact over many steps
    g = GENERATOR
    n = 50
    am = fo.to_mont(pack([g] * n))
    acc = fo.to_mont(pack([1] * n))
    for _ in range(3):
        acc = fo.mont_mul(acc, am)
    got = unpack(fo.from_mont(acc))
    assert got == [pow(g, 3, P)] * n


def test_batch_shapes():
    # 2D batch shape (8, 4, 4)
    rng = random.Random(7)
    vals = _rand_values(rng, 16)
    a = pack(vals).reshape(8, 4, 4)
    b = pack(list(reversed(vals))).reshape(8, 4, 4)
    am, bm = fo.to_mont(a), fo.to_mont(b)
    prod = fo.from_mont(fo.mont_mul(am, bm)).reshape(8, 16)
    assert unpack(prod) == [
        x * y % P for x, y in zip(vals, list(reversed(vals)))
    ]


def test_pack_be17_matches_int_path():
    """Vectorized 17-byte-chunk reduction must be bit-identical to the
    int parse/reduce/pack loop (it feeds the randomizer codeword, whose
    Merkle root is in the transcript)."""
    import numpy as np

    from stark_tpu.ops.limbs import pack, pack_be17
    from stark_tpu.params import P

    rng = np.random.default_rng(3)
    chunks = [
        rng.integers(0, 256, 17, dtype=np.uint8).tobytes() for _ in range(257)
    ]
    chunks += [
        b"\x00" * 17,
        b"\xff" * 17,
        b"\x01" + b"\x00" * 16,
        (P - 1).to_bytes(17, "big"),
        P.to_bytes(17, "big"),
        (P + 1).to_bytes(17, "big"),
        (2 * P).to_bytes(17, "big"),
        ((1 << 136) - 1).to_bytes(17, "big"),
    ]
    got = pack_be17(b"".join(chunks))
    want = pack([int.from_bytes(c, "big") % P for c in chunks])
    assert np.array_equal(got, want)


def test_be17_device_limbs_bit_identical():
    """Device randomizer unpack == host pack_be17 (the bytes feed the
    committed randomizer codeword, so any divergence is a transcript
    break)."""
    import numpy as np

    from stark_tpu.ops import field_ops as fo
    from stark_tpu.ops.limbs import pack_be17

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, 2048 * 17, dtype=np.uint8).tobytes()
    # force edge leading bytes (0 and 255) and an all-0xff chunk
    raw = b"\x00" * 17 + b"\xff" * 17 + raw
    assert np.array_equal(
        pack_be17(raw), np.asarray(fo.be17_device_limbs(raw))
    )
