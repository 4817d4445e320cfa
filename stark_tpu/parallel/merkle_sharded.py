"""Distributed Merkle commitment over mesh-sharded codewords.

Round 1 gathered every per-round codeword whole to one host and hashed it
there.  This module implements the SURVEY §2(d) scheme:

1. one ``all_to_all`` reshards the four-step-layout codeword from
   row(k1)-sharding to column(k2)-sharding — a contiguous k2 range is a
   CONTIGUOUS natural-index block (k = k1 + R*k2), so each device then
   owns exactly one natural-order block of n/D leaves;
2. each block is converted to plain digit rows and hashed into its own
   Merkle SUBTREE with the native C library — in a multi-host deployment
   this is per-host local work on the locally-resident shard;
3. only the D subtree roots cross hosts (an all-gather of 32*D bytes);
   the top log2(D) levels are computed redundantly everywhere.

The assembled tree is byte-identical to :class:`stark_tpu.merkle.MerkleTree`
over the gathered codeword (pinned by tests/test_sharded_merkle.py), and
the per-block digit matrices are reused for FRI query openings, so the
prover never builds a monolithic host copy of the codeword.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..hashing import merkle_level
from ..merkle import MerkleTree


def subtree_levels(block_digits: np.ndarray) -> List[bytes]:
    """All Merkle levels (leaf level first, 32-byte subroot last) of one
    natural-order block given as (m, 4) uint32 digit rows."""
    return MerkleTree.from_digits(block_digits).levels


def tree_from_block_levels(block_levels: Sequence[List[bytes]]) -> MerkleTree:
    """Assemble the full tree from per-block subtree levels.

    For levels at or below the subtree roots, the full-tree level is the
    concatenation of the block levels in natural block order (blocks are
    contiguous leaf ranges of equal power-of-two size); above that, the
    top levels are hashed from the D subtree roots (the only data that
    crosses hosts in a distributed deployment)."""
    d = len(block_levels)
    if d & (d - 1):
        raise ValueError("block count must be a power of two")
    depth = len(block_levels[0])
    if any(len(bl) != depth for bl in block_levels):
        raise ValueError("blocks must have equal size")
    levels = [
        b"".join(bl[level] for bl in block_levels) for level in range(depth)
    ]
    cur = levels[-1]  # concatenated subtree roots (= one full level)
    while len(cur) > 32:
        cur = merkle_level(cur)
        levels.append(cur)
    tree = MerkleTree.__new__(MerkleTree)
    tree.num_leaves = len(levels[0]) // 32
    tree.levels = levels
    return tree


def tree_from_blocks(blocks: Sequence[np.ndarray]) -> MerkleTree:
    """Distributed-style commitment from per-device natural-order digit
    blocks: per-block subtrees + top levels from the subtree roots."""
    return tree_from_block_levels([subtree_levels(b) for b in blocks])
