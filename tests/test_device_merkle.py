"""Device Blake2b-256 Merkle vs the host/native tree (bit-exactness)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.merkle import MerkleTree
from stark_tpu.ops import field_ops as fo
from stark_tpu.ops.device_merkle import (
    DeviceMerkleTree,
    blake2b256_single_block,
    leaf_digests,
)
from stark_tpu.ops.limbs import pack
from stark_tpu.params import P
from stark_tpu.serialization import bincode_field_element


def _digest_rows_to_bytes(rows, i):
    return b"".join(
        int(np.asarray(r)[i]).to_bytes(4, "little") for r in rows
    )


def test_single_block_vs_hashlib_node_shape():
    rng = np.random.default_rng(7)
    w = 8
    left = [jnp.asarray(rng.integers(0, 1 << 32, w, dtype=np.uint32))
            for _ in range(8)]
    right = [jnp.asarray(rng.integers(0, 1 << 32, w, dtype=np.uint32))
             for _ in range(8)]
    m = [
        (left[0], left[1]), (left[2], left[3]),
        (left[4], left[5]), (left[6], left[7]),
        (right[0], right[1]), (right[2], right[3]),
        (right[4], right[5]), (right[6], right[7]),
    ] + [0] * 8
    out = blake2b256_single_block(m, 64)
    for i in range(w):
        lbytes = b"".join(
            int(np.asarray(x)[i]).to_bytes(4, "little") for x in left
        )
        rbytes = b"".join(
            int(np.asarray(x)[i]).to_bytes(4, "little") for x in right
        )
        want = hashlib.blake2b(lbytes + rbytes, digest_size=32).digest()
        assert _digest_rows_to_bytes(out, i) == want


@pytest.mark.parametrize("special", [
    [0, 1, 2, P - 1, 1 << 32, (1 << 32) - 1, 1 << 64, (1 << 96) + 5],
])
def test_leaf_digests_vs_bincode_hash(special):
    rng = np.random.default_rng(3)
    vals = special + [int(v) % P for v in rng.integers(0, 1 << 63, 8)]
    mont = fo.to_mont(jnp.asarray(pack(vals)))
    rows = leaf_digests(mont)
    for i, v in enumerate(vals):
        want = hashlib.blake2b(
            bincode_field_element(v), digest_size=32
        ).digest()
        assert _digest_rows_to_bytes(rows, i) == want, f"leaf {i} value {v}"


def test_device_tree_matches_host_tree():
    n = 2048  # smallest size with a device level above the host tail
    rng = np.random.default_rng(11)
    vals = [int(v) % P for v in rng.integers(0, 1 << 63, n)]
    vals[0] = 0
    vals[1] = 1
    vals[2] = P - 1
    mont = fo.to_mont(jnp.asarray(pack(vals)))
    dtree = DeviceMerkleTree(mont)
    htree = MerkleTree.from_codeword(vals)
    assert dtree.root == htree.root
    idxs = [0, 1, 5, 1023, 1024, 2047]
    dtree.prefetch(idxs)
    for i in idxs:
        assert dtree.open(i) == htree.open(i)
    # open without prefetch (single-sibling fetch path)
    assert dtree.open(77) == htree.open(77)


def test_device_tree_rejects_bad_sizes():
    mont = fo.to_mont(jnp.asarray(pack([1, 2, 3, 4])))
    with pytest.raises(ValueError):
        DeviceMerkleTree(mont)


def test_bucket_pad_shapes():
    """Bucket padding pins gather shapes to powers of two >= 8 and pads
    by repeating the first entry (duplicates are harmless cache
    overwrites)."""
    from stark_tpu.ops.device_merkle import _bucket_pad

    assert _bucket_pad([5]) == [5] * 8
    assert _bucket_pad([1, 2, 3]) == [1, 2, 3] + [1] * 5
    assert _bucket_pad(list(range(8))) == list(range(8))
    out = _bucket_pad(list(range(9)))
    assert len(out) == 16 and out[:9] == list(range(9)) and out[9:] == [0] * 7
    # already a power of two above the minimum: unchanged
    assert _bucket_pad(list(range(32))) == list(range(32))


def test_repeated_partial_gathers_exact_paths():
    """Round-5 bucketed one-dispatch gathers: overlapping prefetches
    (second call skips already-cached siblings, producing different
    bucket shapes and padded duplicates) must still yield auth paths
    byte-identical to the host tree."""
    n = 2048
    rng = np.random.default_rng(21)
    vals = [int(v) % P for v in rng.integers(0, 1 << 63, n)]
    mont = fo.to_mont(jnp.asarray(pack(vals)))
    dtree = DeviceMerkleTree(mont)
    htree = MerkleTree.from_codeword(vals)
    first = [3, 100, 1024]
    second = [3, 100, 101, 512, 2047, 9, 77, 1500]  # overlaps + news
    dtree.prefetch(first)
    dtree.prefetch(second)
    for i in sorted(set(first + second)):
        assert dtree.open(i) == htree.open(i)
    assert dtree.root == htree.root
