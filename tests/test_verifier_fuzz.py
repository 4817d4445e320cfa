"""Verifier robustness fuzzing: arbitrary proof mutations must produce a
clean rejection (False or a parse error), never a crash, hang, or
acceptance."""

import random

import pytest

from stark_tpu.field import FieldElement
from stark_tpu.models.rescue_stark import RescueStark
from stark_tpu.proof_stream import ProofStream
from stark_tpu.rng import DeterministicRandom


@pytest.fixture(scope="module")
def setup():
    model = RescueStark(rng=DeterministicRandom(99))
    x = FieldElement(424242)
    output, proof = model.prove(x)
    assert model.verify(output, proof)
    return model, output, proof


def test_random_byte_flips_rejected(setup):
    model, output, proof = setup
    rng = random.Random(0)
    for _ in range(20):
        mutated = bytearray(proof)
        for _ in range(rng.randrange(1, 4)):
            pos = rng.randrange(len(mutated))
            mutated[pos] ^= 1 << rng.randrange(8)
        assert not model.verify(output, bytes(mutated))


def test_truncations_rejected(setup):
    model, output, proof = setup
    rng = random.Random(1)
    for _ in range(10):
        cut = rng.randrange(len(proof))
        assert not model.verify(output, proof[:cut])


def test_object_level_mutations_rejected(setup):
    model, output, proof = setup
    rng = random.Random(2)
    objects = ProofStream.deserialize(proof).objects
    for _ in range(15):
        mutated = list(objects)
        op = rng.randrange(4)
        idx = rng.randrange(len(mutated))
        if op == 0:
            del mutated[idx]
        elif op == 1:
            mutated.insert(idx, mutated[idx])
        elif op == 2:
            mutated[idx] = ""
        else:
            mutated[idx], mutated[-1] = mutated[-1], mutated[idx]
        assert not model.verify(
            output, ProofStream(mutated).serialize()
        )


def test_shortened_last_codeword_rejected_cleanly(setup):
    """ADVICE r1 regression: a crafted proof whose last FRI codeword is
    SHORTENED — with the matching round root recomputed so the Merkle
    consistency check passes — must be cleanly rejected (the verifier's
    omega-order check), not crash with AssertionError."""
    from stark_tpu.merkle import MerkleTree
    from stark_tpu.serialization import (
        json_field_element_vec,
        json_parse_field_element_vec,
    )

    model, output, proof = setup
    objects = list(ProofStream.deserialize(proof).objects)
    rounds = model.stark.fri.num_rounds()
    num_registers = model.stark.num_registers
    # transcript layout: bq roots, randomizer root, FRI round roots,
    # last codeword, ...
    last_root_idx = num_registers + 1 + rounds - 1
    last_cw_idx = num_registers + 1 + rounds
    last_cw = [
        fe.value for fe in json_parse_field_element_vec(objects[last_cw_idx])
    ]
    shortened = last_cw[: len(last_cw) // 2]
    objects[last_cw_idx] = json_field_element_vec(shortened)
    objects[last_root_idx] = MerkleTree.from_codeword(shortened).root.hex()
    crafted = ProofStream(objects).serialize()
    assert model.verify(output, crafted) is False

    # and at the protocol layer: Fri.verify returns False, no exception
    ps = ProofStream(objects[num_registers + 1 :])
    assert model.stark.fri.verify(ps, []) is False


def test_garbage_inputs_rejected(setup):
    model, output, _ = setup
    rng = random.Random(3)
    for size in [0, 1, 7, 8, 100, 10_000]:
        blob = bytes(rng.randrange(256) for _ in range(size))
        assert not model.verify(output, blob)


def test_malformed_path_and_digit_objects_rejected(setup):
    """Round-5 parser strictness inside a full proof: replace transcript
    objects with structurally adjacent but invalid encodings (31/33-byte
    auth-path digests, bool/overflow digits, deep nesting) — clean
    rejection, never acceptance or a non-ValueError crash."""
    import json

    model, output, proof = setup
    objects = ProofStream.deserialize(proof).objects
    # find an auth path (a JSON list of 32-int lists) and a field element
    path_idx = next(
        i for i, o in enumerate(objects)
        if o.startswith("[[") and '"' not in o
    )
    fe_idx = next(
        i for i, o in enumerate(objects) if o.startswith('{"value"')
    )
    path = json.loads(objects[path_idx])
    bad_objects = {
        path_idx: [
            json.dumps([path[0][:31]] + path[1:]),       # short digest
            json.dumps([path[0] + [0]] + path[1:]),      # long digest
            json.dumps([[256] * 32] + path[1:]),         # byte overflow
            "[" * 600 + "]" * 600,                       # nesting bomb
        ],
        fe_idx: [
            '{"value":["Plus",[true]]}',
            '{"value":["Plus",[4294967296]]}',
            '{"value":["Plus",5]}',
        ],
    }
    for idx, variants in bad_objects.items():
        for bad in variants:
            mutated = list(objects)
            mutated[idx] = bad
            assert not model.verify(
                output, ProofStream(mutated).serialize()
            )
