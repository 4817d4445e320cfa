"""Proof-stream / Fiat-Shamir tests (mirrors reference:
proof_stream.rs:76-95) plus wire-format golden bytes."""

import hashlib

import pytest

from stark_tpu.proof_stream import ProofStream


def test_serialize_round_trip():
    p1 = ProofStream()
    for s in ["1", "2", "3", "4"]:
        p1.push(s)
    data = p1.serialize()
    p2 = ProofStream.deserialize(data)
    assert p1.pull() == p2.pull()
    assert p1.pull() == p2.pull()
    assert p1.pull() == p2.pull()
    assert p1.pull() == "4"
    assert p2.pull() == "4"
    assert p1.prover_fiat_shamir(32) == p2.prover_fiat_shamir(32)


def test_pull_empty_raises():
    ps = ProofStream()
    with pytest.raises(IndexError):
        ps.pull()


def test_bincode_vec_string_format():
    # bincode 1.x: u64 LE count, then per-string u64 LE length + bytes
    ps = ProofStream(["ab", "c"])
    expected = (
        (2).to_bytes(8, "little")
        + (2).to_bytes(8, "little")
        + b"ab"
        + (1).to_bytes(8, "little")
        + b"c"
    )
    assert ps.serialize() == expected


def test_verifier_fiat_shamir_prefix():
    ps = ProofStream(["x", "y", "z"])
    # before any pull: FS over empty prefix
    empty = hashlib.shake_256((0).to_bytes(8, "little")).digest(32)
    assert ps.verifier_fiat_shamir(32) == empty
    ps.pull()
    one = hashlib.shake_256(
        (1).to_bytes(8, "little") + (1).to_bytes(8, "little") + b"x"
    ).digest(32)
    assert ps.verifier_fiat_shamir(32) == one
    # after pulling everything, verifier FS == prover FS
    ps.pull()
    ps.pull()
    assert ps.verifier_fiat_shamir(32) == ps.prover_fiat_shamir(32)


def test_prover_fiat_shamir_is_shake256():
    ps = ProofStream(["hello"])
    expected = hashlib.shake_256(ps.serialize()).digest(64)
    assert ps.prover_fiat_shamir(64) == expected
