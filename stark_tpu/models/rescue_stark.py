"""The flagship "model": Rescue-Prime hash-preimage STARK proofs.

High-level pipeline API over the protocol stack — the analogue of the
reference's end-to-end test scenario (reference: stark.rs:730-777) as a
first-class, batchable object:

* ``prove(input)`` — one proof of knowledge of a hash preimage;
* ``prove_batch(inputs)`` — data-parallel batch proving: witness traces
  for ALL instances are generated in one batched device kernel
  (:mod:`stark_tpu.ops.rescue`), then proofs are produced per instance
  (each proof is an independent transcript, as in the reference protocol);
* ``verify(claimed_output, proof)``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..field import FieldElement
from ..rescue_prime import RescuePrime
from ..rng import RandomBytes, os_random_bytes
from ..stark import Stark
from ..utils import get_logger

log = get_logger("stark_tpu.models.rescue_stark")


class RescueStark:
    """Proofs of knowledge of Rescue-Prime hash preimages."""

    def __init__(
        self,
        expansion_factor: int = 4,
        num_colinearity_tests: int = 2,
        security_level: int = 2,
        backend=None,
        rng: RandomBytes = os_random_bytes,
    ) -> None:
        self.rescue = RescuePrime()
        self.backend = backend
        self.stark = Stark(
            expansion_factor,
            num_colinearity_tests,
            security_level,
            self.rescue.m,
            self.rescue.N + 1,
            backend=backend,
            rng=rng,
        )
        self._air = self.rescue.transition_constraints(self.stark.omicron)

    # -- single instance --------------------------------------------------

    def hash(self, input_element: FieldElement) -> FieldElement:
        return self.rescue.hash(input_element)

    def prove(self, input_element: FieldElement) -> Tuple[FieldElement, bytes]:
        """Returns (hash output, proof bytes)."""
        output = self.rescue.hash(input_element)
        trace = self.rescue.trace(input_element)
        boundary = self.rescue.boundary_constraints(output)
        proof = self.stark.prove(trace, self._air, boundary)
        return output, proof

    def verify(self, claimed_output: FieldElement, proof: bytes) -> bool:
        boundary = self.rescue.boundary_constraints(claimed_output)
        try:
            return self.stark.verify(proof, self._air, boundary)
        except (ValueError, IndexError, KeyError, AssertionError) as exc:
            # same filter as FibonacciStark: crafted proofs must yield a
            # clean rejection, never a crash (ADVICE r1)
            log.debug("proof rejected while parsing: %s", exc)
            return False

    # -- batch ------------------------------------------------------------

    def prove_batch(
        self, inputs: Sequence[FieldElement]
    ) -> List[Tuple[FieldElement, bytes]]:
        """Prove many instances; witness generation is batched on device
        when a backend is attached.  Each proof is an independent
        Fiat-Shamir transcript, exactly as in the reference protocol —
        there is no cross-instance aggregation, so instances can also be
        distributed across processes/hosts by the caller."""
        inputs = list(inputs)
        if self.backend is not None and len(inputs) > 1:
            raw = self.backend.rescue_trace([x.value for x in inputs])
            traces = [
                [
                    [FieldElement(raw[i, c, r]) for r in range(self.rescue.m)]
                    for c in range(self.rescue.N + 1)
                ]
                for i in range(len(inputs))
            ]
        else:
            traces = [self.rescue.trace(x) for x in inputs]

        results = []
        for trace in traces:
            output = FieldElement(trace[-1][0].value)
            boundary = self.rescue.boundary_constraints(output)
            proof = self.stark.prove(trace, self._air, boundary)
            results.append((output, proof))
        return results


