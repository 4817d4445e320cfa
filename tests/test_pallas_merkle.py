"""Pallas Blake2b Merkle kernels vs the XLA path (interpret mode on
CPU): identical digest bytes at every level, so the TPU tree — which
dispatches to these kernels — stays byte-identical to
stark_tpu.merkle.MerkleTree."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.merkle import MerkleTree
from stark_tpu.ops.device_merkle import (
    TAIL_WIDTH,
    leaf_digests_from_digits,
    level_hash,
)
from stark_tpu.ops.pallas_merkle import (
    leaf_digests_pallas,
    level_hash_pallas,
    tree_levels,
)
from stark_tpu.params import P


def _digits(vals):
    rows = np.zeros((4, len(vals)), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(4):
            rows[j, i] = (v >> (32 * j)) & 0xFFFFFFFF
    return jnp.asarray(rows)


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(21)
    out = [int(v) % P for v in rng.integers(0, 1 << 62, 2048)]
    out[0] = 0
    out[1] = 1
    out[2] = P - 1
    out[3] = 1 << 32  # digit-count edge: low digit zero, second nonzero
    return out


def test_leaf_digests_match_xla(vals):
    d = _digits(vals)
    want = np.asarray(jnp.stack(leaf_digests_from_digits(d)))
    got = np.asarray(leaf_digests_pallas(d, interpret=True))
    assert (got == want).all()


def test_level_hash_matches_xla(vals):
    d = _digits(vals)
    level = jnp.stack(leaf_digests_from_digits(d))
    want = np.asarray(jnp.stack(level_hash([level[i] for i in range(8)])))
    got = np.asarray(level_hash_pallas(level, interpret=True))
    assert (got == want).all()


def test_tree_levels_full_tree(vals):
    d = _digits(vals)
    levels, root = tree_levels(d, TAIL_WIDTH, interpret=True)
    host = MerkleTree.from_codeword(vals)
    root_bytes = np.ascontiguousarray(
        np.asarray(root).astype("<u4")
    ).tobytes()
    assert root_bytes == host.root
    # leaf level matches the host leaf hashing too
    leaf_level = np.asarray(levels[0])
    first_leaf = np.ascontiguousarray(
        leaf_level[:, 0].astype("<u4")
    ).tobytes()
    assert first_leaf == host.open(1)[0]  # sibling of leaf 1 == leaf 0
