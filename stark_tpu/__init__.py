"""stark_tpu — a TPU-native STARK/FRI proving framework.

A from-scratch reimplementation of the capabilities of the reference STARK
library (Rescue-Prime hash-preimage proofs via AIR -> quotients -> FRI with
Blake2b Merkle commitments and a Shake256 Fiat-Shamir transcript), designed
TPU-first:

* the prime field GF(1 + 407*2^119) is implemented both as a host golden
  model (:mod:`stark_tpu.field`) and as batched 16-bit-limb Montgomery
  kernels for the TPU VPU (:mod:`stark_tpu.ops`);
* all Reed-Solomon extensions go through (coset) NTTs instead of per-point
  Horner evaluation;
* multi-chip scaling shards the NTT/codeword dimension over a
  ``jax.sharding.Mesh`` with XLA collectives (:mod:`stark_tpu.parallel`);
* Merkle/Fiat-Shamir hashing is byte-compatible with the reference wire
  formats (:mod:`stark_tpu.serialization`) and batch-accelerated natively.
"""

from .field import FieldElement
from .fri import Fri
from .merkle import MerkleTree
from .mpoly import MPolynomial
from .poly import Polynomial
from .proof_stream import ProofStream
from .rescue_prime import RescuePrime
from .rng import DeterministicRandom, RecordedRandom, os_random_bytes
from .stark import Stark

__all__ = [
    "FieldElement",
    "Fri",
    "MerkleTree",
    "MPolynomial",
    "Polynomial",
    "ProofStream",
    "RescuePrime",
    "Stark",
    "DeterministicRandom",
    "RecordedRandom",
    "os_random_bytes",
    "RescueStark",
    "FibonacciStark",
    "MimcStark",
    "RescueChainStark",
    "JaxBackend",
]


def __getattr__(name):
    # lazy convenience exports (importing the device backend pulls in jax;
    # keep plain-protocol imports light)
    if name == "RescueStark":
        from .models.rescue_stark import RescueStark

        return RescueStark
    if name == "FibonacciStark":
        from .models.fibonacci import FibonacciStark

        return FibonacciStark
    if name == "MimcStark":
        from .models.mimc import MimcStark

        return MimcStark
    if name == "RescueChainStark":
        from .models.rescue_chain import RescueChainStark

        return RescueChainStark
    if name == "JaxBackend":
        from .ops.backend import JaxBackend

        return JaxBackend
    raise AttributeError(f"module 'stark_tpu' has no attribute {name!r}")

__version__ = "0.1.0"
