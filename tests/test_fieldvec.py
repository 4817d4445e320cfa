"""Differential tests: native fieldvec kernels vs the Python golden model.

The C kernels (native/fieldvec.c) are a pure performance seam — every
output must be bit-identical to the host model in stark_tpu.ntt /
stark_tpu.fri / plain Python-int arithmetic (reference semantics:
ntt.rs:25-107, fri.rs:133-139).
"""

import numpy as np
import pytest

from stark_tpu.field import FieldElement
from stark_tpu.fri import Fri, _inverse_table
from stark_tpu.ntt import NTT, _ntt_in_place
from stark_tpu.params import GENERATOR, P

fv = pytest.importorskip("stark_tpu.native.fieldvec")


def _rand_residues(rng, n):
    # include edge values: 0, 1, p-1
    vals = [int(v) % P for v in rng.integers(0, 1 << 62, n)]
    vals[0] = 0
    if n > 2:
        vals[1] = 1
        vals[2] = P - 1
    return vals


@pytest.mark.parametrize("n", [8, 64, 512, 2048])
def test_ntt_forward_inverse_matches_scalar(n):
    rng = np.random.default_rng(7)
    vals = _rand_residues(rng, n)
    om = NTT(n).omega.value

    ref = list(vals)
    _ntt_in_place(ref, inverse=False)
    assert fv.ntt_rows([vals], False, om)[0] == ref

    back = fv.ntt_rows([ref], True, om)[0]
    assert back == vals


@pytest.mark.parametrize("n", [64, 512])
def test_coset_ntt_matches_scalar_path(n):
    rng = np.random.default_rng(8)
    vals = _rand_residues(rng, n)
    om = NTT(n).omega.value

    # scalar reference: scale by offset^j then plain scalar NTT
    a = list(vals)
    scale = 1
    for j in range(1, n):
        scale = scale * GENERATOR % P
        a[j] = a[j] * scale % P
    _ntt_in_place(a, inverse=False)

    got = fv.ntt_rows([vals], False, om, GENERATOR)[0]
    assert got == a
    assert fv.ntt_rows([got], True, om, GENERATOR)[0] == vals


def test_batched_rows_equal_individual():
    rng = np.random.default_rng(9)
    n = 256
    rows = [_rand_residues(rng, n) for _ in range(5)]
    om = NTT(n).omega.value
    batched = fv.ntt_rows(rows, False, om, GENERATOR)
    for row, got in zip(rows, batched):
        assert got == fv.ntt_rows([row], False, om, GENERATOR)[0]


def test_ntt_class_dispatch_is_bit_identical():
    # NTT() routes through native when available; pin against the scalar
    # in-place butterfly directly
    rng = np.random.default_rng(10)
    n = 128
    vals = _rand_residues(rng, n)
    ntt = NTT(n)
    ref = list(vals)
    _ntt_in_place(ref, inverse=False)
    assert ntt.forward(vals) == ref
    inv_ref = list(ref)
    _ntt_in_place(inv_ref, inverse=True)
    n_inv = pow(n, -1, P)
    assert ntt.inverse(ref) == [x * n_inv % P for x in inv_ref]


def test_fri_fold_matches_host():
    rng = np.random.default_rng(11)
    n = 512
    omega = FieldElement.primitive_nth_root(n).value
    cw = _rand_residues(rng, n)
    alpha = 987654321
    half = n // 2
    inv = _inverse_table(GENERATOR, omega, half)
    two_inv = pow(2, -1, P)
    want = [
        two_inv
        * ((1 + alpha * inv[i] % P) * cw[i]
           + (1 - alpha * inv[i] % P) * cw[half + i])
        % P
        for i in range(half)
    ]
    assert Fri._fold_host(cw, alpha, GENERATOR, omega) == want
    assert fv.fri_fold(cw, alpha, GENERATOR, omega) == want


def test_poly_eval_many():
    rng = np.random.default_rng(14)
    coeffs = _rand_residues(rng, 300)
    xs = _rand_residues(rng, 9)

    def horner(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        return acc

    assert fv.poly_eval_many(coeffs, xs) == [horner(x) for x in xs]
    assert fv.poly_eval_many([], xs) == [0] * 9
    assert fv.poly_eval_many([7], xs) == [7] * 9


def test_batch_inverse():
    rng = np.random.default_rng(12)
    vals = [int(v) % P or 1 for v in rng.integers(1, 1 << 62, 300)]
    vals[5] = 1
    vals[6] = P - 1
    assert fv.batch_inverse(vals) == [pow(v, -1, P) for v in vals]
    with pytest.raises(ZeroDivisionError):
        fv.batch_inverse([3, 0, 5])


def test_column_algebra():
    rng = np.random.default_rng(13)
    n = 200
    a = _rand_residues(rng, n)
    b = _rand_residues(rng, n)
    ca, cb = fv.col_from_ints(a), fv.col_from_ints(b)
    assert fv.col_to_ints(fv.col_mul(ca, cb)) == [
        x * y % P for x, y in zip(a, b)
    ]
    assert fv.col_to_ints(fv.col_add(ca, cb)) == [
        (x + y) % P for x, y in zip(a, b)
    ]
    assert fv.col_to_ints(fv.col_sub(ca, cb)) == [
        (x - y) % P for x, y in zip(a, b)
    ]
    s = 123456789012345678901234567890 % P
    assert fv.col_to_ints(fv.col_scale(ca, fv.mont_scalar(s))) == [
        x * s % P for x in a
    ]
    # comb_term: acc += w1*cw + w2*xs*cw
    acc = fv.col_from_ints(a)
    w1, w2 = 17, 999999999999999 % P
    fv.comb_term(acc, cb, ca, fv.mont_scalar(w1), fv.mont_scalar(w2))
    assert fv.col_to_ints(acc) == [
        (x + w1 * y + w2 * x * y) % P for x, y in zip(a, b)
    ]


def test_geom_series():
    base, start, n = 1234567 % P, GENERATOR, 50
    got = fv.unpack_pairs(fv.geom_series(base, start, n))
    cur, want = start % P, []
    for _ in range(n):
        want.append(cur)
        cur = cur * base % P
    assert got == want


def test_pack_unpack_roundtrip():
    vals = [0, 1, P - 1, 2**64, 2**64 - 1, 2**127 % P, 12345]
    assert fv.unpack_pairs(fv.pack_pairs(vals)) == vals
