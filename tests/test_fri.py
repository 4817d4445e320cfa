"""FRI protocol tests (mirrors reference: fri.rs:427-505), plus
index-sampling determinism and negative tests."""

import hashlib

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.fri import Fri, sample_index, sample_indices
from stark_tpu.params import P
from stark_tpu.poly import Polynomial
from stark_tpu.proof_stream import ProofStream


def _make_fri(initial_codeword_length=256, expansion_factor=4, tests=17):
    omega = FieldElement.primitive_nth_root(initial_codeword_length)
    return Fri(
        FieldElement.generator(),
        omega,
        initial_codeword_length,
        expansion_factor,
        tests,
    )


def test_sample_index_is_64bit_fold():
    digest = hashlib.blake2b(b"seed", digest_size=64).digest()
    # the fold keeps only the last 8 bytes (big-endian) due to u64 wrap
    expected = int.from_bytes(digest[-8:], "big") % 1000
    assert sample_index(digest, 1000) == expected


def test_sample_indices_deduplicates_by_reduced_index():
    seed = b"\x01" * 32
    idxs = sample_indices(seed, 256, 16, 10)
    assert len(idxs) == 10
    reduced = [i % 16 for i in idxs]
    assert len(set(reduced)) == 10
    # deterministic
    assert idxs == sample_indices(seed, 256, 16, 10)


def test_num_rounds():
    fri = _make_fri(512, 4, 2)
    assert fri.num_rounds() == 6
    fri = _make_fri(256, 4, 17)
    # 256 -> 128 -> 64: stops when 4*17=68 >= 64
    assert fri.num_rounds() == 2


def test_eval_domain():
    fri = _make_fri(64, 4, 2)
    domain = fri.eval_domain()
    g = FieldElement.generator()
    omega = fri.omega
    assert domain[0] == g
    assert domain[5] == g * omega.pow(5)
    assert len(domain) == 64


def test_fri_prove_verify():
    """Full FRI round-trip on a degree-127 polynomial — the reference's
    exact scenario shape (fri.rs:427-505: (degree+1)*expansion = 512,
    17 colinearity tests), including the negative test."""
    degree = 127
    expansion_factor = 4
    num_colinearity_tests = 17
    initial_codeword_length = (degree + 1) * expansion_factor

    omega = FieldElement.primitive_nth_root(initial_codeword_length)
    generator = FieldElement.generator()
    fri = Fri(
        generator, omega, initial_codeword_length, expansion_factor,
        num_colinearity_tests,
    )

    polynomial = Polynomial(list(range(degree + 1)))
    domain = [omega.pow(i) for i in range(initial_codeword_length)]
    codeword = polynomial.eval_domain(domain)

    proof_stream = ProofStream()
    fri.prove(codeword, proof_stream)

    points = []
    assert fri.verify(proof_stream, points)
    for idx, val in points:
        assert polynomial.eval(omega.pow(idx)) == val

    # now corrupt the codeword: zero a prefix -> proof must fail
    bad = [fe.value for fe in codeword]
    for i in range(degree // 3):
        bad[i] = 0
    proof_stream = ProofStream()
    fri.prove(bad, proof_stream)
    points = []
    assert not fri.verify(proof_stream, points)


def test_fri_transcript_deterministic():
    fri = _make_fri(64, 4, 4)
    poly = Polynomial([3, 1, 4, 1, 5, 9, 2, 6])
    codeword = poly.eval_domain(fri.eval_domain())
    ps1, ps2 = ProofStream(), ProofStream()
    fri.prove(codeword, ps1)
    fri.prove(codeword, ps2)
    assert ps1.serialize() == ps2.serialize()


def test_fri_tampered_transcript_fails():
    fri = _make_fri(64, 4, 4)
    poly = Polynomial([3, 1, 4, 1, 5, 9, 2, 6])
    codeword = poly.eval_domain(fri.eval_domain())
    ps = ProofStream()
    fri.prove(codeword, ps)
    # tamper with the first Merkle root
    objects = list(ps.objects)
    objects[0] = ("0" * 64) if objects[0] != "0" * 64 else ("1" * 64)
    bad = ProofStream(objects)
    points = []
    assert not fri.verify(bad, points)


def test_fri_rejects_too_few_rounds():
    omega = FieldElement.primitive_nth_root(8)
    with pytest.raises(ValueError):
        Fri(FieldElement.generator(), omega, 8, 8, 4)


def test_fold_digits_matches_fold_host():
    """The device prover's host-tail fold (vectorized digit matrices,
    stark_tpu.fri._fold_digits) is bit-identical to the Python-int
    reference fold across several rounds."""
    import numpy as np

    from stark_tpu.fri import _fold_digits

    rng = np.random.default_rng(11)
    n = 128
    codeword = [int.from_bytes(rng.bytes(16), "little") % P for _ in range(n)]
    digits = np.zeros((n, 4), dtype=np.uint32)
    for i, v in enumerate(codeword):
        for j in range(4):
            digits[i, j] = (v >> (32 * j)) & 0xFFFFFFFF

    offset = FieldElement.generator().value
    omega = FieldElement.primitive_nth_root(n).value
    for r in range(3):
        alpha = int.from_bytes(rng.bytes(16), "little") % P
        codeword = Fri._fold_host(codeword, alpha, offset, omega)
        digits = _fold_digits(digits, alpha, offset, omega)
        got = [
            int(d[0]) | int(d[1]) << 32 | int(d[2]) << 64 | int(d[3]) << 96
            for d in digits
        ]
        assert got == codeword, f"digit fold diverged at round {r}"
        omega = omega * omega % P
        offset = offset * offset % P
