"""Device compute backend wired into the protocol layers.

``JaxBackend`` routes the prover's hot numeric stages to the TPU:

* ``rs_extend`` — Reed-Solomon extension (coset NTT evaluation) of a
  coefficient vector onto the FRI domain; replaces the reference's
  per-point Horner loop (reference: stark.rs:291-298, its hottest stage);
* ``fri_fold`` — the FRI split-and-fold kernel (reference: fri.rs:133-139);
* ``rescue_hash`` / ``rescue_trace`` — batched witness generation.

The protocol objects (:class:`stark_tpu.fri.Fri`,
:class:`stark_tpu.stark.Stark`) accept ``backend=JaxBackend()`` and fall
back to the host golden model when no backend is attached (or below the
size floor where device dispatch is not worth it).  Results are bit-equal
either way — the backend is a pure performance seam, differential-tested
in tests/test_device_ntt.py and tests/test_backend_stark.py.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from ..params import P
from . import field_ops as fo
from . import fold as fold_ops
from . import rescue as rescue_ops
from .limbs import pack, unpack
from .ntt import get_plan


#: sizes at/above this use the Pallas four-step NTT (measured crossover on
#: TPU v5e: XLA wins below ~2^18, Pallas wins 2.1x at 2^20 and 5.7x at 2^22)
# Honest (fetch-bracketed) timing shows the Pallas four-step beating the
# XLA stage-by-stage plan at EVERY size it supports (2^16: 0.02 vs 0.38
# ms; 2^18: 0.96 vs 5.7 ms; benches/crossover_retime.py) — the round-1
# 2^18 crossover was an artifact of block_until_ready under-measurement.
# 2^13 is the kernel's minimum (C = 128 lanes, R = 64 >= 8 sublanes).
PALLAS_NTT_MIN_SIZE = 1 << 13


def best_plan(n: int):
    """XLA stage-by-stage plan for small n, Pallas four-step for large n
    (TPU only — Mosaic kernels don't compile for the CPU backend)."""
    if n >= PALLAS_NTT_MIN_SIZE and jax.default_backend() != "cpu":
        from .pallas_ntt import get_pallas_plan

        return get_pallas_plan(n)
    return get_plan(n)


class JaxBackend:
    """TPU/JAX execution of the prover's batched numeric stages."""

    #: below this codeword size, host lists beat device dispatch — each
    #: dispatch costs ~milliseconds of latency (tens of ms through a
    #: remote-TPU tunnel) while the host NTT handles 4k elements in ~1ms
    min_device_size = 8192

    #: FRI domains at/above this size run the device-resident prover
    #: pipeline (stark.Stark._prove_device): codewords stay on the TPU
    #: across RS-extend -> AIR -> quotients -> combination -> FRI folds
    device_prover_min = 8192

    def make_prover_core(self, n: int, offset: int):
        """Device-resident prover core for one FRI domain, shared
        process-wide (see :func:`stark_tpu.ops.device_prover.get_core`:
        the giant compiled modules are pure in (n, offset))."""
        from .device_prover import get_core

        return get_core(n, offset)

    def rs_extend(self, coeffs: Sequence[int], n: int, offset: int) -> List[int]:
        """Evaluate the polynomial (coeffs, lowest-first) over the coset
        {offset * omega_n^i}; returns n plain residues."""
        if n < self.min_device_size:
            from ..ntt import NTT

            return NTT(n).coset_evaluate(list(coeffs), offset)
        padded = list(coeffs) + [0] * (n - len(coeffs))
        plan = best_plan(n)
        a = fo.to_mont(jax.numpy.asarray(pack(padded)))
        out = fo.from_mont(plan.coset_forward(a, offset % P))
        return unpack(np.asarray(jax.device_get(out)))

    def rs_restrict(self, evals: Sequence[int], offset: int) -> List[int]:
        """Inverse of :meth:`rs_extend`: coset evaluations -> coefficients."""
        n = len(evals)
        if n < self.min_device_size:
            from ..ntt import NTT

            return NTT(n).coset_interpolate(list(evals), offset)
        plan = best_plan(n)
        a = fo.to_mont(jax.numpy.asarray(pack(list(evals))))
        out = fo.from_mont(plan.coset_inverse(a, offset % P))
        return unpack(np.asarray(jax.device_get(out)))

    def poly_multiply(self, a: Sequence[int], b: Sequence[int]) -> List[int]:
        """Polynomial product via device NTTs (used e.g. by the
        geometric-progression interpolation chirps on long traces)."""
        if not a or not b:
            return []
        result_size = len(a) + len(b) - 1
        n = 1 << (result_size - 1).bit_length()
        if n < self.min_device_size:
            from ..ntt import poly_multiply

            return poly_multiply(list(a), list(b))
        plan = best_plan(n)
        fa = fo.to_mont(
            jax.numpy.asarray(pack(list(a) + [0] * (n - len(a))))
        )
        fb = fo.to_mont(
            jax.numpy.asarray(pack(list(b) + [0] * (n - len(b))))
        )
        prod = plan.inverse(fo.mont_mul(plan.forward(fa), plan.forward(fb)))
        out = unpack(np.asarray(jax.device_get(fo.from_mont(prod))))
        return out[:result_size]

    def fri_fold(
        self, codeword: Sequence[int], alpha: int, offset: int, omega: int
    ) -> List[int]:
        return fold_ops.fri_fold(codeword, alpha, offset, omega)

    def rescue_hash(self, inputs: Sequence[int]) -> List[int]:
        return rescue_ops.hash_batch(inputs)

    def rescue_trace(self, inputs: Sequence[int]) -> np.ndarray:
        return rescue_ops.trace_batch(inputs)
