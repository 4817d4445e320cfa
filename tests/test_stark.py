"""End-to-end STARK tests (mirrors reference: stark.rs:726-777) plus
deterministic-transcript and tamper tests."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.params import OMICRON_128
from stark_tpu.rescue_prime import RescuePrime
from stark_tpu.rng import DeterministicRandom
from stark_tpu.stark import Stark


def _setup(expansion_factor=4, num_colinearity_tests=2, security_level=2, rng=None):
    rp = RescuePrime()
    input_element = FieldElement.sample(bytes([48, 120, 100, 101, 97, 100, 98, 101, 101, 102]))
    output_element = rp.hash(input_element)
    stark = Stark(
        expansion_factor,
        num_colinearity_tests,
        security_level,
        rp.m,
        rp.N + 1,
        rng=rng or DeterministicRandom(0),
    )
    trace = rp.trace(input_element)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(output_element)
    return rp, stark, trace, air, boundary


def test_stark_domain_parameters():
    _, stark, _, _, _ = _setup()
    # small config: randomized trace 28+8=36, omicron domain 128, fri 512
    assert stark.num_randomizers == 8
    assert stark.omicron_domain_length == 128
    assert stark.fri_domain_length == 512
    assert stark.omicron.value == OMICRON_128  # reference: stark.rs:65
    assert stark.fri.num_rounds() == 6


def test_stark_prove_verify_small():
    """The reference e2e scenario (4, 2, 2) with the 0xdeadbeef-derived
    input (reference: stark.rs:730-777)."""
    rp, stark, trace, air, boundary = _setup()
    proof = stark.prove(trace, air, boundary)
    assert isinstance(proof, bytes) and len(proof) > 1000
    assert stark.verify(proof, air, boundary)


def test_stark_proof_deterministic_with_seeded_rng():
    rp, stark1, trace, air, boundary = _setup(rng=DeterministicRandom(42))
    proof1 = stark1.prove(trace, air, boundary)
    _, stark2, _, _, _ = _setup(rng=DeterministicRandom(42))
    proof2 = stark2.prove(trace, air, boundary)
    assert proof1 == proof2
    # different seed -> different proof bytes (randomizers differ)
    _, stark3, _, _, _ = _setup(rng=DeterministicRandom(43))
    proof3 = stark3.prove(trace, air, boundary)
    assert proof1 != proof3
    assert stark1.verify(proof3, air, boundary)


def test_stark_rejects_wrong_output():
    rp, stark, trace, air, boundary = _setup()
    proof = stark.prove(trace, air, boundary)
    # verify against boundary conditions for a different output
    wrong_output = FieldElement(12345)
    wrong_boundary = rp.boundary_constraints(wrong_output)
    assert not stark.verify(proof, air, wrong_boundary)


def test_stark_rejects_tampered_trace():
    rp, stark, trace, air, boundary = _setup()
    trace = [list(row) for row in trace]
    trace[10][0] = trace[10][0] + FieldElement.one()
    # the prover's own degree check trips on the inconsistent trace,
    # or (if it were skipped) verification fails; accept either signal
    try:
        proof = stark.prove(trace, air, boundary)
    except ValueError:
        return
    assert not stark.verify(proof, air, boundary)


def test_stark_rejects_truncated_proof():
    rp, stark, trace, air, boundary = _setup()
    proof = stark.prove(trace, air, boundary)
    from stark_tpu.proof_stream import ProofStream
    ps = ProofStream.deserialize(proof)
    truncated = ProofStream(ps.objects[:-2]).serialize()
    with pytest.raises(Exception):
        ok = stark.verify(truncated, air, boundary)
        assert not ok


def test_stark_hash_chain_two_links():
    """Chain proofs like the reference's trial loop (stark.rs:742-776)."""
    rp = RescuePrime()
    output = FieldElement.sample(b"0xdeadbeef")
    for _ in range(2):
        inp = output
        output = rp.hash(inp)
        stark = Stark(4, 2, 2, rp.m, rp.N + 1, rng=DeterministicRandom(7))
        trace = rp.trace(inp)
        air = rp.transition_constraints(stark.omicron)
        boundary = rp.boundary_constraints(output)
        proof = stark.prove(trace, air, boundary)
        assert stark.verify(proof, air, boundary)


def test_recorded_randomness_replays_proof():
    """RecordedRandom replays another prover's randomness draws for
    byte-exact cross-prover reproduction (the cross-verification seam,
    see docs/TRANSCRIPT_COMPAT.md)."""
    from stark_tpu.rng import DeterministicRandom, RecordedRandom

    rp, stark, trace, air, boundary = _setup(rng=DeterministicRandom(31))
    proof = stark.prove(trace, air, boundary)

    # capture the draws the deterministic rng produced...
    drbg = DeterministicRandom(31)
    draws = [drbg(17) for _ in range(stark.num_randomizers * rp.m + 200)]
    # ...and replay them through a RecordedRandom
    _, stark2, _, _, _ = _setup(rng=RecordedRandom(draws))
    proof2 = stark2.prove(trace, air, boundary)
    assert proof2 == proof


def test_tz_eval_batch_matches_dense_horner():
    """The verifier's batched transition-zeroifier evaluation (vectorized
    numpy Montgomery columns) is bit-identical to Horner on the dense
    zeroifier polynomial, on both the small-trace fallback and the
    vectorized large-trace path."""
    for trace_length in (28, 300):
        stark = Stark(4, 2, 2, 2, trace_length)
        tz = stark.transition_zeroifier()
        xs = [
            FieldElement.generator() * stark.omega.pow(i)
            for i in (0, 3, 7, 123, 999)
        ]
        want = [tz.eval(x).value for x in xs]
        got = [fe.value for fe in stark._tz_eval_batch(xs)]
        assert got == want
    assert Stark(4, 2, 2, 2, 28)._tz_eval_batch([]) == []
