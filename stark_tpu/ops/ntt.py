"""Device (JAX) radix-2 NTT over GF(p) in the limb/Montgomery representation.

Computes the same DFT as the host golden model (:mod:`stark_tpu.ntt`):
``forward`` maps coefficients (natural order, lowest-first, Montgomery form)
to evaluations at consecutive powers of the canonical primitive n-th root;
coset variants evaluate over {offset * omega^i} by pre/post-scaling with a
power table — the Reed-Solomon fast path the reference lacks
(reference: univariate_poly.rs:44-54 falls back to per-point Horner on
coset domains).

Structure per transform: one bit-reversal gather, then log2(n) butterfly
stages.  A stage reshapes the batch to (limbs, groups, len) and runs one
batched mont_mul + add/sub over the halves, so the whole transform is
~log2(n) fused elementwise kernels on the VPU; twiddle tables are
precomputed host-side in Montgomery form and cached on device.

All plans are cached per (n); jitted transforms are cached per shape, so
steady-state calls are dispatch-only.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FieldElement
from ..params import NUM_LIMBS, P, R_MOD_P
from . import field_ops as fo
from .limbs import pack


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _mont_pack(values: Sequence[int]) -> np.ndarray:
    """Pack Python residues directly into Montgomery form on host."""
    return pack([v * R_MOD_P % P for v in values])


def _power_table(base: int, n: int) -> List[int]:
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % P
    return out


class NTTPlan:
    """Precomputed tables + jitted transforms for one size n."""

    def __init__(self, n: int) -> None:
        if n & (n - 1) or n <= 1:
            raise ValueError("NTT size must be a power of 2 and > 1")
        self.n = n
        self.omega = FieldElement.primitive_nth_root(n).value
        omega_inv = pow(self.omega, -1, P)
        self.bitrev = jnp.asarray(_bit_reverse_indices(n))

        # per-stage twiddles, Montgomery form, shapes (8, len/2)
        self.twiddles_fwd = []
        self.twiddles_inv = []
        length = 2
        while length <= n:
            w_f = pow(self.omega, n // length, P)
            w_i = pow(omega_inv, n // length, P)
            self.twiddles_fwd.append(
                jnp.asarray(_mont_pack(_power_table(w_f, length // 2)))
            )
            self.twiddles_inv.append(
                jnp.asarray(_mont_pack(_power_table(w_i, length // 2)))
            )
            length *= 2

        n_inv = pow(n, -1, P)
        self.n_inv_mont = jnp.asarray(_mont_pack([n_inv]))  # (8, 1)

        # periodic twiddle tables for the fixed-shape (roll) formulation:
        # stage s has period 2^(s+1) = [1]*half + [w^0..w^(half-1)]
        self.twiddle_periods_fwd = []
        self.twiddle_periods_inv = []
        length = 2
        s = 0
        while length <= n:
            half = length // 2
            for tables, out in (
                (self.twiddles_fwd, self.twiddle_periods_fwd),
                (self.twiddles_inv, self.twiddle_periods_inv),
            ):
                tw = np.asarray(tables[s])  # (8, half) Montgomery
                period = np.concatenate(
                    [np.tile(_mont_pack([1]), (1, half)), tw], axis=1
                )
                out.append(jnp.asarray(period))  # (8, length)
            length *= 2
            s += 1

        import os

        self.variant = os.environ.get("STARK_TPU_NTT_VARIANT", "reshape")
        self._forward_jit = jax.jit(lambda a: self._transform_any(a, False))
        self._inverse_jit = jax.jit(lambda a: self._transform_any(a, True))

    def _transform_any(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        if self.variant == "roll":
            return self._transform_roll(a, inverse)
        return self._transform(a, inverse)

    def _transform_roll(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """Fixed-shape NTT: every stage operates on the full (8, *, n) array
        with static rolls and bitmask selects instead of reshapes, avoiding
        per-stage layout retiling on TPU.  2x redundant multiplies, but no
        data movement between tilings."""
        n = self.n
        x = a[..., self.bitrev]
        periods = (
            self.twiddle_periods_inv if inverse else self.twiddle_periods_fwd
        )
        idx = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
        length = 2
        s = 0
        while length <= n:
            half = length // 2
            period = periods[s]
            reps = n // length
            T = jnp.tile(period, (1, reps))  # (8, n)
            if x.ndim > 2:
                T = T.reshape((NUM_LIMBS,) + (1,) * (x.ndim - 2) + (n,))
            v = fo.mont_mul(x, T)
            v_left = jnp.roll(v, -half, axis=-1)
            x_right = jnp.roll(x, half, axis=-1)
            mask = (idx & half) == 0  # first half of each block
            x = jnp.where(mask, fo.add(x, v_left), fo.sub(x_right, v))
            length *= 2
            s += 1
        if inverse:
            scale = self.n_inv_mont.reshape(
                (NUM_LIMBS,) + (1,) * (x.ndim - 1)
            )
            x = fo.mont_mul(x, scale)
        return x

    # -- core ------------------------------------------------------------

    def _transform(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """NTT along the LAST axis of an (8, *batch, n) Montgomery array."""
        n = self.n
        x = a[..., self.bitrev]
        lead = x.shape[:-1]  # (8, *batch)
        tables = self.twiddles_inv if inverse else self.twiddles_fwd
        length = 2
        s = 0
        while length <= n:
            half = length // 2
            xv = x.reshape(NUM_LIMBS, -1, n // length, length)
            tw = tables[s].reshape(NUM_LIMBS, 1, 1, half)
            u = xv[..., :half]
            v = fo.mont_mul(xv[..., half:], tw)
            x = jnp.concatenate([fo.add(u, v), fo.sub(u, v)], axis=-1).reshape(
                *lead, n
            )
            length *= 2
            s += 1
        if inverse:
            scale = self.n_inv_mont.reshape((NUM_LIMBS,) + (1,) * (x.ndim - 1))
            x = fo.mont_mul(x, scale)
        return x

    # -- public (Montgomery-form arrays) ---------------------------------

    def forward(self, a: jnp.ndarray) -> jnp.ndarray:
        """(8, n) Montgomery coefficients -> evaluations at {omega^i}."""
        return self._forward_jit(a)

    def inverse(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Evaluations at {omega^i} -> Montgomery coefficients."""
        return self._inverse_jit(evals)

    # coset scaling tables are cached per offset — as NUMPY: this method is
    # reached from inside other jits (the device prover's fused pipeline),
    # and caching jnp arrays created mid-trace leaks tracers
    @lru_cache(maxsize=16)
    def _offset_tables_np(self, offset: int):
        fwd = _mont_pack(_power_table(offset % P, self.n))
        inv = _mont_pack(_power_table(pow(offset, -1, P), self.n))
        return fwd, inv

    def _offset_tables(self, offset: int):
        fwd, inv = self._offset_tables_np(offset)
        return jnp.asarray(fwd), jnp.asarray(inv)

    def _bshape(self, table: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
        """Reshape an (8, n) table to broadcast against (8, *batch, n)."""
        return table.reshape(
            (NUM_LIMBS,) + (1,) * (like.ndim - 2) + (self.n,)
        )

    def coset_forward(self, a: jnp.ndarray, offset: int) -> jnp.ndarray:
        """Evaluate over {offset * omega^i}: scale coeff j by offset^j, NTT."""
        fwd, _ = self._offset_tables(offset)
        return self._forward_jit(fo.mont_mul(a, self._bshape(fwd, a)))

    def coset_inverse(self, evals: jnp.ndarray, offset: int) -> jnp.ndarray:
        _, inv = self._offset_tables(offset)
        out = self._inverse_jit(evals)
        return fo.mont_mul(out, self._bshape(inv, out))


@lru_cache(maxsize=32)
def get_plan(n: int) -> NTTPlan:
    return NTTPlan(n)
