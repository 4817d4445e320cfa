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

Twiddle tables are THREADED AS ARGUMENTS into the jitted transforms
(``op_tables`` / ``apply``), not closed over: a closure constant is baked
into the compiled module as a literal, which at 2^20 put ~32 MB of table
bytes into every executable — ~100 MB serialized modules that took
minutes to compile (and to move through this machine's remote-compile
tunnel) and filled the persistent cache with 90 MB entries.  As
arguments they are device-resident operands; modules shrink ~20x with
bit-identical outputs.

All plans are cached per (n); jitted transforms are cached per
(direction, coset?) structure — the offset only changes table VALUES, so
different offsets share one executable.
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
        self.twiddles_fwd = tuple(self.twiddles_fwd)
        self.twiddles_inv = tuple(self.twiddles_inv)

        n_inv = pow(n, -1, P)
        self.n_inv_mont = jnp.asarray(_mont_pack([n_inv]))  # (8, 1)

        import os

        self.variant = os.environ.get("STARK_TPU_NTT_VARIANT", "reshape")
        self._periods = None  # lazy: only the "roll" variant needs them
        self._jit_cache = {}

    # -- table plumbing ---------------------------------------------------

    def _period_tables(self):
        """Periodic twiddle tables for the fixed-shape (roll) formulation:
        stage s has period 2^(s+1) = [1]*half + [w^0..w^(half-1)].  Built
        lazily — they double the table memory and only the roll variant
        reads them."""
        if self._periods is None:
            fwd, inv = [], []
            length = 2
            s = 0
            while length <= self.n:
                half = length // 2
                for tables, out in (
                    (self.twiddles_fwd, fwd),
                    (self.twiddles_inv, inv),
                ):
                    tw = np.asarray(tables[s])  # (8, half) Montgomery
                    period = np.concatenate(
                        [np.tile(_mont_pack([1]), (1, half)), tw], axis=1
                    )
                    out.append(jnp.asarray(period))  # (8, length)
                length *= 2
                s += 1
            self._periods = (tuple(fwd), tuple(inv))
        return self._periods

    def op_tables(self, inverse: bool, offset: int = 1):
        """Concrete device-array pytree for one transform: everything
        :meth:`apply` reads.  Thread this through any enclosing ``jit``
        as an ARGUMENT to keep table bytes out of the compiled module."""
        if self.variant == "roll":
            tws = self._period_tables()[1 if inverse else 0]
        else:
            tws = self.twiddles_inv if inverse else self.twiddles_fwd
        if offset % P == 1:
            return (tws, None)
        if inverse:
            off = self._offset_tables(offset)[1]
        else:
            off = self._offset_tables(offset)[0]
        return (tws, off)

    def apply(self, a: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
        """Traceable transform along the LAST axis of an (8, *batch, n)
        Montgomery array, reading ONLY ``tables`` (from :meth:`op_tables`
        — possibly threaded through an outer jit)."""
        tws, off = tables
        if off is not None and not inverse:
            a = fo.mont_mul(a, self._bshape(off, a))
        if self.variant == "roll":
            x = self._transform_roll(a, tws, inverse)
        else:
            x = self._transform(a, tws, inverse)
        if off is not None and inverse:
            x = fo.mont_mul(x, self._bshape(off, x))
        return x

    def _jitted(self, inverse: bool):
        fn = self._jit_cache.get(inverse)
        if fn is None:
            fn = self._jit_cache[inverse] = jax.jit(
                lambda a, t: self.apply(a, t, inverse)
            )
        return fn

    # -- core ------------------------------------------------------------

    def _transform_roll(self, a: jnp.ndarray, periods, inverse: bool):
        """Fixed-shape NTT: every stage operates on the full (8, *, n) array
        with static rolls and bitmask selects instead of reshapes, avoiding
        per-stage layout retiling on TPU.  2x redundant multiplies, but no
        data movement between tilings."""
        n = self.n
        x = a[..., self.bitrev]
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

    def _transform(self, a: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
        """NTT along the LAST axis of an (8, *batch, n) Montgomery array."""
        n = self.n
        x = a[..., self.bitrev]
        lead = x.shape[:-1]  # (8, *batch)
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
        return self._jitted(False)(a, self.op_tables(False))

    def inverse(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Evaluations at {omega^i} -> Montgomery coefficients."""
        return self._jitted(True)(evals, self.op_tables(True))

    # coset scaling tables are cached per offset — as device arrays built
    # from host numpy exactly once per (plan, offset)
    @lru_cache(maxsize=16)
    def _offset_tables_np(self, offset: int):
        fwd = _mont_pack(_power_table(offset % P, self.n))
        inv = _mont_pack(_power_table(pow(offset, -1, P), self.n))
        return fwd, inv

    @lru_cache(maxsize=16)
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
        if offset % P == 1:
            return self.forward(a)
        return self._jitted(False)(a, self.op_tables(False, offset))

    def coset_inverse(self, evals: jnp.ndarray, offset: int) -> jnp.ndarray:
        if offset % P == 1:
            return self.inverse(evals)
        return self._jitted(True)(evals, self.op_tables(True, offset))


@lru_cache(maxsize=32)
def get_plan(n: int) -> NTTPlan:
    return NTTPlan(n)
