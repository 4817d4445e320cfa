"""Sharded FRI proving through the production path (ShardedProverCore +
Fri._prove_device): byte-identical transcripts to the host prover, on an
8-virtual-device CPU mesh.

Round 3 review: the standalone ShardedFriProver (which gathered every
per-round codeword whole to one host) was superseded dead weight; these
tests pin the SAME transcript-identity guarantees on the real sharded
pipeline instead (reference FRI semantics: fri.rs:100-254)."""

import random

from stark_tpu.field import FieldElement
from stark_tpu.fri import Fri
from stark_tpu.params import GENERATOR, P
from stark_tpu.parallel import cpu_mesh
from stark_tpu.parallel.stark_sharded import ShardedProverCore
from stark_tpu.poly import Polynomial
from stark_tpu.proof_stream import ProofStream


def _host_transcript(fri, codeword):
    ps = ProofStream()
    idx = fri.prove(codeword, ps)
    return idx, ps


def test_sharded_core_fri_transcript_identical():
    n = 1 << 12
    expansion, tests = 4, 8
    omega = FieldElement.primitive_nth_root(n)
    fri = Fri(FieldElement.generator(), omega, n, expansion, tests)

    rng = random.Random(0)
    degree = n // expansion - 1
    coeffs = [rng.randrange(P) for _ in range(degree + 1)]
    codeword = Polynomial(coeffs).eval_domain(fri.eval_domain())

    idx_host, ps_host = _host_transcript(fri, codeword)

    mesh = cpu_mesh(8)
    core = ShardedProverCore(n, GENERATOR, mesh)
    dcw = core.extend_codeword(coeffs)
    ps_dev = ProofStream()
    idx_dev = fri._prove_device(dcw, ps_dev)

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
    core = ShardedProverCore(n, GENERATOR, cpu_mesh(4))
    got = core.extend_codeword(coeffs).to_list()
    want = [
        fe.value for fe in Polynomial(coeffs).eval_domain(fri.eval_domain())
    ]
    assert got == want


def test_sharded_core_fri_long_cascade():
    """With few colinearity tests there are more FRI rounds than the
    device path covers; the host tail takes over and the transcript must
    still match the host prover exactly."""
    n = 1 << 12
    fri = Fri(FieldElement.generator(), FieldElement.primitive_nth_root(n),
              n, 4, 2)
    assert fri.num_rounds() == 9

    rng = random.Random(5)
    coeffs = [rng.randrange(P) for _ in range(n // 4)]
    codeword = Polynomial(coeffs).eval_domain(fri.eval_domain())

    _, ps_host = _host_transcript(fri, codeword)

    core = ShardedProverCore(n, GENERATOR, cpu_mesh(8))
    ps_dev = ProofStream()
    fri._prove_device(core.extend_codeword(coeffs), ps_dev)
    assert ps_dev.serialize() == ps_host.serialize()
