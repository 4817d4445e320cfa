"""Rescue-Prime hash-chain model: chained permutations through
per-constraint transition exemptions.  The reference proves exactly one
28-cycle permutation (rescue_prime.rs:230-293); these tests pin the
chained statement end-to-end at small L on the host path."""

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.rescue_chain import RescueChainAir, RescueChainStark
from stark_tpu.rescue_prime import RescuePrime
from stark_tpu.rng import DeterministicRandom


def _model(L, seed=11, **kw):
    return RescueChainStark(L, rng=DeterministicRandom(seed), **kw)


def test_chain_matches_iterated_hash():
    rp = RescuePrime()
    air = RescueChainAir(3)
    x = FieldElement(1)
    assert air.chain(x) == rp.hash(rp.hash(rp.hash(x)))
    # golden anchor: hash(1) from the reference's vector feeds the chain
    assert rp.hash(x) == FieldElement(244180265933090377212304188905974087294)


def test_native_witness_matches_python_golden_model():
    """native/rescue.c is a pure performance seam: every recorded state
    of the chain must equal the Python golden model's, bit for bit (the
    trace feeds Merkle leaf bytes, so any difference is a transcript
    change)."""
    rescue_native = pytest.importorskip("stark_tpu.native.rescue_native")
    rp = RescuePrime()
    L, x = 5, 123456789
    nat = rescue_native.chain_trace(x, L)
    assert nat.shape == (28 * L, 2)
    h = FieldElement(x)
    i = 0
    for _ in range(L):
        seg = rp.trace(h)
        for row in seg:
            assert [int(nat[i][0]), int(nat[i][1])] == [
                row[0].value, row[1].value
            ], f"row {i} diverges"
            i += 1
        h = seg[-1][0]
    # and the wired-in model path actually returns the same rows
    air = RescueChainAir(L)
    rows = air.trace(FieldElement(x))
    assert [[e.value for e in r] for r in rows] == [
        [int(a), int(b)] for a, b in nat
    ]
    assert air.chain(FieldElement(x)) == rows[-1][0]


def test_trace_shape_and_crossings():
    air = RescueChainAir(3)
    trace = air.trace(FieldElement(7))
    assert len(trace) == 28 * 3
    assert air.crossings == [27, 55]
    # crossing rows: digest carries, capacity resets
    for c in air.crossings:
        assert trace[c + 1][0] == trace[c][0]
        assert trace[c + 1][1] == FieldElement.zero()


def test_prove_verify_roundtrip():
    model = _model(3)
    output, proof = model.prove(FieldElement(57))
    assert output == model.air.chain(FieldElement(57))
    assert model.verify(output, proof)
    # wrong claimed output rejected
    assert not model.verify(output + FieldElement(1), proof)


def test_single_hash_chain_degenerates_to_plain_rescue():
    model = _model(1)
    rp = RescuePrime()
    output, proof = model.prove(FieldElement(1))
    assert output == rp.hash(FieldElement(1))
    assert model.verify(output, proof)


def test_tampered_trace_breaks_the_prover():
    model = _model(2)
    trace = model.air.trace(FieldElement(9))
    trace[13][0] = trace[13][0] + FieldElement(1)  # inside segment 0
    boundary = model.air.boundary_constraints(trace[-1][0])
    with pytest.raises(ValueError):
        model.stark.prove(trace, model.constraints, boundary)


def test_broken_chain_link_breaks_the_prover():
    # honest per-segment permutations but a severed link: segment 1
    # hashes a DIFFERENT input than segment 0's digest
    air = RescueChainAir(2)
    rp = RescuePrime()
    rows = rp.trace(FieldElement(5)) + rp.trace(FieldElement(6))
    model = _model(2)
    boundary = model.air.boundary_constraints(rows[-1][0])
    with pytest.raises(ValueError):
        model.stark.prove(rows, model.constraints, boundary)


def test_symbolic_transcript_matches_evaluation():
    # both prover algorithms, same rng -> byte-identical transcripts
    m_eval = _model(2, seed=3)
    out, p_eval = m_eval.prove(FieldElement(42))
    m_sym = _model(2, seed=3, **{})
    m_sym.stark.algorithm = "symbolic"
    _, p_sym = m_sym.prove(FieldElement(42))
    assert p_eval == p_sym
    assert m_eval.verify(out, p_sym)


def test_exemption_plumbing_validation():
    from stark_tpu.stark import Stark

    with pytest.raises(ValueError):
        Stark(4, 2, 2, 2, 28, transition_exemptions=[3, [4]])
    # count mismatch surfaces at prove/verify-time bookkeeping
    air = RescueChainAir(2)
    s = Stark(
        4, 2, 2, 2, air.trace_length,
        transition_exemptions=[[27], [27]],  # 2 lists for 4 constraints
        degree_target="fri",
    )
    model = _model(2)
    with pytest.raises(ValueError):
        s.transition_quotient_degree_bounds(model.constraints)


def test_omicron_domain_override_validation():
    from stark_tpu.stark import Stark

    with pytest.raises(ValueError):
        Stark(4, 2, 2, 2, 28, omicron_domain_length=96)  # not a power of 2
    with pytest.raises(ValueError):
        Stark(4, 2, 2, 2, 28, omicron_domain_length=64)  # below minimum
    s = Stark(4, 2, 2, 2, 28, omicron_domain_length=256)
    assert s.fri_domain_length == 1024


def test_cli_rescue_chain_round_trip(tmp_path, capsys):
    import json

    from stark_tpu.cli import main as cli_main

    proof_file = str(tmp_path / "chain.bin")
    rc = cli_main(
        [
            "prove", "--model", "rescue-chain", "--hashes", "2",
            "--input", "1", "--out", proof_file, "--seed", "5",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    rp = RescuePrime()
    assert out["output"] == str(rp.hash(rp.hash(FieldElement(1))).value)

    rc = cli_main(
        [
            "verify", "--model", "rescue-chain", "--hashes", "2",
            "--output", out["output"], "--proof", proof_file,
        ]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["valid"] is True

    # cross-model flag and chain-input rejection
    with pytest.raises(SystemExit):
        cli_main(["prove", "--model", "rescue", "--hashes", "4",
                  "--input", "1", "--out", proof_file])
    with pytest.raises(SystemExit):
        cli_main(["verify", "--model", "rescue-chain", "--hashes", "2",
                  "--input", "1", "--output", out["output"],
                  "--proof", proof_file])


def test_chain_device_pipeline_transcript_identical(monkeypatch):
    """Device-resident prove of a chain (per-constraint zeroifiers in the
    combination megakernel) must be byte-identical to the host pipeline,
    and the grouped verifier path (host and device-gather variants) must
    agree with plain dict evaluation."""
    from stark_tpu import stark as stark_mod
    from stark_tpu.ops.backend import JaxBackend

    backend = JaxBackend()
    backend.device_prover_min = 512
    host = _model(4, seed=21)
    dev = RescueChainStark(
        4, backend=backend, rng=DeterministicRandom(21)
    )
    assert dev.stark._use_device_pipeline()
    x = FieldElement(77)
    out_h, proof_h = host.prove(x)
    out_d, proof_d = dev.prove(x)
    assert out_h == out_d
    assert proof_h == proof_d

    # all three verifier AIR-evaluation routes accept the same proof:
    # dict walk (default at this size), grouped host, grouped device
    assert host.verify(out_h, proof_h)
    monkeypatch.setattr(stark_mod, "BIG_AIR_DICT", 1)
    assert host.verify(out_h, proof_h)   # grouped, host extensions
    assert dev.verify(out_d, proof_d)    # grouped, device gather
    assert not dev.verify(out_d + FieldElement(1), proof_d)
