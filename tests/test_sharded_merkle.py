"""Distributed Merkle commitment: per-shard subtrees + root combination
must be byte-identical to the monolithic tree."""

import numpy as np
import pytest

from stark_tpu.merkle import MerkleTree
from stark_tpu.params import P


def _digits_of(values):
    d = np.zeros((len(values), 4), dtype=np.uint32)
    for i, v in enumerate(values):
        for k in range(4):
            d[i, k] = (v >> (32 * k)) & 0xFFFFFFFF
    return d


def test_tree_from_blocks_matches_monolithic():
    from stark_tpu.parallel.merkle_sharded import tree_from_blocks

    rng = np.random.default_rng(1)
    values = [int(rng.integers(0, 1 << 62)) * 104729 % P for _ in range(256)]
    whole = MerkleTree.from_codeword(values)
    for d in (1, 2, 4, 8):
        m = 256 // d
        blocks = [_digits_of(values[i * m : (i + 1) * m]) for i in range(d)]
        tree = tree_from_blocks(blocks)
        assert tree.root == whole.root, f"root mismatch at D={d}"
        assert tree.levels == whole.levels
        for idx in (0, 97, 255):
            assert tree.open(idx) == whole.open(idx)


def test_sharded_core_merkle_matches_host():
    """End-to-end on a CPU mesh: the ShardedProverCore commitment (block
    reshard + subtree hashing) equals the host tree over the gathered
    codeword."""
    import jax

    from stark_tpu.parallel import cpu_mesh
    from stark_tpu.parallel.stark_sharded import ShardedProverCore
    from stark_tpu.params import GENERATOR

    mesh = cpu_mesh(8)
    n = 1 << 11
    core = ShardedProverCore(n, GENERATOR, mesh)
    rng = np.random.default_rng(2)
    coeffs = [int(rng.integers(0, 1 << 62)) for _ in range(300)]
    cw = core.extend_codeword(coeffs)
    tree = core.merkle_tree(cw)

    # reference: host NTT -> host tree
    from stark_tpu.ntt import NTT

    host_cw = NTT(n).coset_evaluate(coeffs + [0] * (n - len(coeffs)), GENERATOR)
    host_tree = MerkleTree.from_codeword(host_cw)
    assert tree.root == host_tree.root
    assert tree.open(1234) == host_tree.open(1234)
    # and the reused block digits agree with the codeword
    assert cw.to_list() == host_cw
