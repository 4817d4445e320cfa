"""Sharded FRI prover: byte-identical transcripts to the host prover,
on an 8-virtual-device CPU mesh."""

import random

from stark_tpu.field import FieldElement
from stark_tpu.fri import Fri
from stark_tpu.params import P
from stark_tpu.parallel import cpu_mesh
from stark_tpu.parallel.fri_sharded import ShardedFriProver
from stark_tpu.poly import Polynomial
from stark_tpu.proof_stream import ProofStream


def test_sharded_fri_transcript_identical():
    n = 1 << 12
    expansion, tests = 4, 8
    omega = FieldElement.primitive_nth_root(n)
    fri = Fri(FieldElement.generator(), omega, n, expansion, tests)

    rng = random.Random(0)
    degree = n // expansion - 1
    coeffs = [rng.randrange(P) for _ in range(degree + 1)]
    poly = Polynomial(coeffs)
    codeword = poly.eval_domain(fri.eval_domain())

    ps_host = ProofStream()
    idx_host = fri.prove(codeword, ps_host)

    mesh = cpu_mesh(8)
    sharded = ShardedFriProver(fri, mesh)
    ps_dev = ProofStream()
    idx_dev = sharded.prove_coefficients(coeffs, ps_dev)

    assert idx_dev == idx_host
    assert ps_dev.serialize() == ps_host.serialize()

    # and the host verifier accepts the sharded proof
    points = []
    assert fri.verify(ProofStream(list(ps_dev.objects)), points)


def test_sharded_extension_matches_host():
    n = 1 << 11
    fri = Fri(
        FieldElement.generator(),
        FieldElement.primitive_nth_root(n),
        n, 4, 4,
    )
    rng = random.Random(1)
    coeffs = [rng.randrange(P) for _ in range(n // 4)]
    mesh = cpu_mesh(4)
    sharded = ShardedFriProver(fri, mesh)
    cw_dev = sharded.extend_coefficients(coeffs)
    got = sharded._natural_from_device(cw_dev)
    want = [
        fe.value for fe in Polynomial(coeffs).eval_domain(fri.eval_domain())
    ]
    assert got == want


def test_sharded_fri_exhausts_device_folds():
    """With few colinearity tests the fold cascade outruns the C axis
    (more FRI rounds than log2(C)); the tail falls back to host folds and
    the transcript must still match the host prover exactly."""
    n = 1 << 12
    fri = Fri(FieldElement.generator(), FieldElement.primitive_nth_root(n),
              n, 4, 2)
    assert fri.num_rounds() == 9  # folds (8) > log2(C) for the 8-dev split

    rng = random.Random(5)
    coeffs = [rng.randrange(P) for _ in range(n // 4)]
    codeword = Polynomial(coeffs).eval_domain(fri.eval_domain())

    ps_host = ProofStream()
    fri.prove(codeword, ps_host)

    sharded = ShardedFriProver(fri, cpu_mesh(8))
    ps_dev = ProofStream()
    sharded.prove_coefficients(coeffs, ps_dev)
    assert ps_dev.serialize() == ps_host.serialize()
