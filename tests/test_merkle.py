"""Merkle tree tests, including the adversarial suite
(mirrors reference: merkle.rs:156-207)."""

import hashlib
import random

import pytest

from stark_tpu import merkle
from stark_tpu.merkle import MerkleTree


def _random_data(rng, n):
    return [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 100))) for _ in range(n)]


def test_root_matches_manual_hashing():
    # 4 leaves: root = H(H(H(a)||H(b)) || H(H(c)||H(d)))
    data = [b"a", b"b", b"c", b"d"]

    def h(x):
        return hashlib.blake2b(x, digest_size=32).digest()

    expected = h(h(h(b"a") + h(b"b")) + h(h(b"c") + h(b"d")))
    assert merkle.commit(data) == expected


def test_single_leaf():
    data = [b"only"]
    tree = MerkleTree(data)
    assert tree.root == hashlib.blake2b(b"only", digest_size=32).digest()
    assert tree.open(0) == []
    assert merkle.verify(tree.root, 0, [], b"only")


def test_merkle_adversarial():
    rng = random.Random(1)
    n = 64
    leafs = _random_data(rng, n)
    tree = MerkleTree(leafs)
    root = tree.root

    # all openings verify
    for i in range(n):
        path = tree.open(i)
        assert merkle.verify(root, i, path, leafs[i])

    # wrong data fails
    for i in range(n):
        path = tree.open(i)
        wrong = _random_data(rng, 1)[0]
        assert not merkle.verify(root, i, path, wrong)

    # wrong index fails
    for i in range(n):
        path = tree.open(i)
        assert not merkle.verify(root, (i + 1) % n, path, leafs[i])

    # fake root fails
    for i in range(0, n, 7):
        path = tree.open(i)
        fake_root = bytes(rng.randrange(256) for _ in range(32))
        assert not merkle.verify(fake_root, i, path, leafs[i])

    # each tampered path element fails
    for i in range(0, n, 13):
        path = tree.open(i)
        for j in range(len(path)):
            tampered = list(path)
            tampered[j] = bytes(rng.randrange(256) for _ in range(32))
            assert not merkle.verify(root, i, tampered, leafs[i])

    # different tree's root fails
    other_root = merkle.commit(_random_data(rng, n))
    for i in range(0, n, 7):
        path = tree.open(i)
        assert not merkle.verify(other_root, i, path, leafs[i])


def test_stateless_api_matches_tree():
    rng = random.Random(2)
    leafs = _random_data(rng, 16)
    tree = MerkleTree(leafs)
    assert merkle.commit(leafs) == tree.root
    for i in range(16):
        assert merkle.open(i, leafs) == tree.open(i)


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        MerkleTree([b"a", b"b", b"c"])
    with pytest.raises(ValueError):
        MerkleTree([])


def test_invalid_open_index():
    tree = MerkleTree([b"a", b"b"])
    with pytest.raises(IndexError):
        tree.open(2)


def test_hashlib_fallback_matches_native(monkeypatch):
    """Without the native C library, the pure-hashlib path must build
    bit-identical trees (the native lib is a performance feature only)."""
    import random

    from stark_tpu import hashing
    from stark_tpu.merkle import MerkleTree

    rng = random.Random(9)
    values = [rng.randrange(407 * 2**119 + 1) for _ in range(256)]
    native_tree = MerkleTree.from_codeword(values)

    monkeypatch.setattr(hashing, "_native", None)
    fallback_tree = MerkleTree.from_codeword(values)
    assert fallback_tree.root == native_tree.root
    assert fallback_tree.levels == native_tree.levels
    for i in [0, 100, 255]:
        assert fallback_tree.open(i) == native_tree.open(i)
