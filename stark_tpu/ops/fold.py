"""Device FRI fold kernel.

One round of FRI folding (reference: fri.rs:133-139):

    c'_i = 1/2 * [ (1 + alpha * inv_i) * c_i + (1 - alpha * inv_i) * c_{i+N/2} ]

with inv_i = (offset * omega^i)^{-1}.  The reference performs two extended-
Euclid inversions per element inside the loop; here the inverse table is a
precomputed geometric series (one host inversion), and the fold itself is a
single fused elementwise kernel over the half-codeword batch: 4 mont_muls +
2 adds/subs per output element.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..params import P
from . import field_ops as fo
from .limbs import pack, unpack
from .ntt import _mont_pack, _power_table


@lru_cache(maxsize=64)
def _fold_tables(offset: int, omega: int, half: int):
    """Montgomery tables: inv_i = (offset * omega^i)^{-1}, i < half.

    Kept as numpy so the lru_cache never holds tracers."""
    inv_offset = pow(offset, -1, P)
    inv_omega = pow(omega, -1, P)
    invs = _power_table(inv_omega, half)
    invs = [v * inv_offset % P for v in invs]
    return _mont_pack(invs)


@lru_cache(maxsize=4)
def _consts(_: int = 0):
    # numpy, not jnp: the cache must never hold tracers
    one = _mont_pack([1])
    two_inv = _mont_pack([pow(2, -1, P)])
    return one, two_inv


@jax.jit
def fold_mont(
    codeword: jnp.ndarray, alpha: jnp.ndarray, inv_table: jnp.ndarray
) -> jnp.ndarray:
    """Fold a Montgomery-form (8, N) codeword to (8, N/2)."""
    half = codeword.shape[1] // 2
    u = codeword[:, :half]
    v = codeword[:, half:]
    one, two_inv = _consts()
    ai = fo.mont_mul(alpha, inv_table)
    left = fo.mont_mul(fo.add(one, ai), u)
    right = fo.mont_mul(fo.sub(one, ai), v)
    return fo.mont_mul(two_inv, fo.add(left, right))


def fri_fold(
    codeword: Sequence[int], alpha: int, offset: int, omega: int
) -> List[int]:
    """Host-facing fold: plain residues in, plain residues out."""
    half = len(codeword) // 2
    cw = fo.to_mont(jnp.asarray(pack(list(codeword))))
    a = fo.to_mont(jnp.asarray(pack([alpha])))
    inv_table = jax.numpy.asarray(_fold_tables(offset % P, omega % P, half))
    out = fo.from_mont(fold_mont(cw, a, inv_table))
    return unpack(jax.device_get(out))
