"""Domain-sharded FRI proving for codewords larger than one chip.

The codeword lives on the mesh in four-step layout (see
:mod:`stark_tpu.parallel.ntt_sharded`): row(k1)-sharded (8, R, C) with
natural index k = k1 + R*k2.  Per FRI round:

* the codeword is gathered to the host in natural order for Merkle
  hashing (hashing is host/native-C work and every element is a leaf, so
  this transfer is inherent to the commitment, not an artifact);
* the fold runs shard-local on device (:class:`ShardedFold` — zero
  cross-chip traffic, because fold partners share k1);
* Fiat-Shamir, queries and auth paths run on the host transcript exactly
  as in :class:`stark_tpu.fri.Fri`.

Transcripts are byte-identical to the single-host prover — pinned by
tests on an 8-virtual-device CPU mesh.

Multi-host note: with one process per host, the gather becomes a
per-host shard dump plus an all-gather of subtree roots; leaves are
strided across shards in natural order, so production multi-host hashing
would re-shard to natural blocks first (one all_to_all).  Single-process
meshes (one host, N chips) need none of that.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..field import FieldElement
from ..fri import Fri
from ..merkle import MerkleTree
from ..params import NUM_LIMBS, P, R_MOD_P
from ..proof_stream import ProofStream
from ..serialization import json_field_element_vec
from ..ops import field_ops as fo
from ..ops.limbs import pack, unpack
from ..ops.ntt import _mont_pack, _power_table
from .fold_sharded import ShardedFold
from .ntt_sharded import ShardedNTT


class ShardedFriProver:
    """FRI prover over a mesh-sharded codeword (byte-identical transcripts)."""

    def __init__(self, fri: Fri, mesh: Mesh) -> None:
        self.fri = fri
        self.mesh = mesh
        self.sntt = ShardedNTT(fri.domain_length, mesh)
        self.fold = ShardedFold(mesh, self.sntt.R)

    # -- layout helpers ---------------------------------------------------

    def _natural_from_device(self, cw_dev: jnp.ndarray) -> List[int]:
        """Gather a four-step-layout device codeword to host natural order
        (plain residues)."""
        mat = np.asarray(jax.device_get(fo.from_mont(cw_dev)))
        n = mat.shape[1] * mat.shape[2]
        nat = np.transpose(mat, (0, 2, 1)).reshape(NUM_LIMBS, n)
        return unpack(nat)

    def extend_coefficients(self, coeffs: Sequence[int]) -> jnp.ndarray:
        """Sharded Reed-Solomon extension: coefficients -> four-step-layout
        codeword over the FRI coset (offset scaling + sharded NTT)."""
        n = self.fri.domain_length
        offset = self.fri.offset.value % P
        padded = list(coeffs) + [0] * (n - len(coeffs))
        mat = self.sntt.to_matrix(
            pack([c * R_MOD_P % P for c in padded])
        )
        x = self.sntt.shard_input(mat)
        # coset prologue: offset^(j1*C + j2) as row x column broadcast
        rowt = jnp.asarray(
            _mont_pack(_power_table(pow(offset, self.sntt.C, P), self.sntt.R))
        )[:, :, None]
        colt = jnp.asarray(_mont_pack(_power_table(offset, self.sntt.C)))[
            :, None, :
        ]
        x = fo.mont_mul(fo.mont_mul(x, rowt), colt)
        return self.sntt.forward(x)

    # -- proving ----------------------------------------------------------

    def prove_codeword_device(
        self, cw_dev: jnp.ndarray, proof_stream: ProofStream
    ) -> List[int]:
        """Full FRI proof from a four-step-layout device codeword.

        Mirrors Fri.commit/prove (reference: fri.rs:100-254) with the fold
        on the mesh; returns the top-level a+b indices."""
        fri = self.fri
        omega = fri.omega.value % P
        offset = fri.offset.value % P
        rounds = fri.num_rounds()

        host_codewords: List[List[int]] = []
        trees: List[MerkleTree] = []
        codeword_host = self._natural_from_device(cw_dev)

        for r in range(rounds):
            n = len(codeword_host)
            assert pow(omega, n - 1, P) == pow(omega, -1, P)
            tree = MerkleTree.from_codeword(codeword_host)
            trees.append(tree)
            proof_stream.push(tree.root.hex())

            if r == rounds - 1:
                break

            alpha = FieldElement.sample(proof_stream.prover_fiat_shamir(32)).value
            host_codewords.append(codeword_host)

            if cw_dev is not None and cw_dev.shape[2] > 1:
                # shard-local device fold in four-step layout
                cw_dev = self.fold(cw_dev, alpha, offset, omega)
                codeword_host = self._natural_from_device(cw_dev)
            else:
                # C exhausted (tiny tail) — fall back to the host fold
                cw_dev = None
                codeword_host = fri._fold(codeword_host, alpha, offset, omega)
            omega = omega * omega % P
            offset = offset * offset % P

        proof_stream.push(json_field_element_vec(codeword_host))
        host_codewords.append(codeword_host)

        from ..fri import sample_indices

        top_level_indices = sample_indices(
            proof_stream.prover_fiat_shamir(32),
            len(host_codewords[0]) // 2,
            len(host_codewords[-1]),
            fri.num_colinearity_tests,
        )
        indices = list(top_level_indices)
        for i in range(len(host_codewords) - 1):
            half = len(host_codewords[i]) // 2
            indices = [idx % half for idx in indices]
            indices = fri.query(
                trees[i],
                trees[i + 1],
                host_codewords[i],
                host_codewords[i + 1],
                indices,
                proof_stream,
            )

        a_indices = list(top_level_indices)
        b_indices = [
            idx + len(host_codewords[0]) // 2 for idx in top_level_indices
        ]
        return a_indices + b_indices

    def prove_coefficients(
        self, coeffs: Sequence[int], proof_stream: ProofStream
    ) -> List[int]:
        """Sharded LDE + sharded FRI proof from coefficient form."""
        return self.prove_codeword_device(
            self.extend_coefficients(coeffs), proof_stream
        )
