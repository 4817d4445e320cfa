"""Batched Rescue-Prime permutation on device.

Vectorizes the scalar permutation (:mod:`stark_tpu.rescue_prime`,
reference: rescue_prime.rs:172-293) over a batch of inputs: state is a
Montgomery-form array of shape (8, m, B).  One round:

* forward S-box x^3: 2 mont_muls on the whole state;
* MDS mix: 4 mont_muls + 2 adds (m=2), round-constant add;
* inverse S-box x^(1/3): a single-multiply-per-step `lax.scan` over the
  fixed 128-bit exponent schedule (see
  :func:`stark_tpu.ops.field_ops.mont_pow_fixed` for why one multiply per
  scan step matters);
* MDS mix + round-constant add again.

The 27 rounds run under a `lax.scan` over stacked per-round constants, so
the compiler sees ONE round body (unrolling all 27 rounds each containing a
250-step inner scan sent XLA:CPU compile time through the roof).
``trace_mont`` uses the scan's stacked outputs to record all N+1 states for
the STARK prover; batch proving amortizes the kernel across many hash
instances per chip.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (
    P,
    RESCUE_ALPHA_INV,
    RESCUE_M,
    RESCUE_MDS,
    RESCUE_N,
    RESCUE_ROUND_CONSTANTS,
)
from . import field_ops as fo
from .limbs import pack, unpack
from .ntt import _mont_pack


@lru_cache(maxsize=1)
def _tables():
    # plain numpy so the cache never holds tracers (these become per-trace
    # constants when first touched inside a jitted function)
    mds = [
        [
            _mont_pack([RESCUE_MDS[i][j] % P])[:, :, None]
            for j in range(RESCUE_M)
        ]
        for i in range(RESCUE_M)
    ]
    # round constants stacked per round: (N, 8, m, 1) Montgomery, for the
    # first and second half-rounds respectively
    def stack(offset):
        rows = []
        for r in range(RESCUE_N):
            consts = [
                RESCUE_ROUND_CONSTANTS[2 * r * RESCUE_M + offset + i] % P
                for i in range(RESCUE_M)
            ]
            rows.append(_mont_pack(consts))  # (8, m)
        return np.stack(rows)[:, :, :, None]  # (N, 8, m, 1)

    return mds, stack(0), stack(RESCUE_M)


def _sbox_cube(state: jnp.ndarray) -> jnp.ndarray:
    return fo.mont_mul(fo.mont_sqr(state), state)


def _mds_mix(state: jnp.ndarray, mds) -> jnp.ndarray:
    s0, s1 = state[:, 0], state[:, 1]
    t0 = fo.add(fo.mont_mul(mds[0][0][:, 0], s0), fo.mont_mul(mds[0][1][:, 0], s1))
    t1 = fo.add(fo.mont_mul(mds[1][0][:, 0], s0), fo.mont_mul(mds[1][1][:, 0], s1))
    return jnp.stack([t0, t1], axis=1)


def _round(state: jnp.ndarray, rc1: jnp.ndarray, rc2: jnp.ndarray, mds) -> jnp.ndarray:
    """One full Rescue round on (8, 2, B) Montgomery state."""
    state = _sbox_cube(state)
    state = fo.add(_mds_mix(state, mds), rc1)
    state = fo.mont_pow_fixed(state, RESCUE_ALPHA_INV)
    state = fo.add(_mds_mix(state, mds), rc2)
    return state


@jax.jit
def permutation_mont(state: jnp.ndarray) -> jnp.ndarray:
    """Full 27-round permutation on (8, 2, B) Montgomery state."""
    mds, rc1, rc2 = _tables()

    def step(s, rc):
        return _round(s, rc[0], rc[1], mds), None

    state, _ = jax.lax.scan(step, state, (rc1, rc2))
    return state


@jax.jit
def trace_mont(state: jnp.ndarray) -> jnp.ndarray:
    """All N+1 states: (N+1, 8, 2, B) Montgomery."""
    mds, rc1, rc2 = _tables()

    def step(s, rc):
        nxt = _round(s, rc[0], rc[1], mds)
        return nxt, nxt

    _, states = jax.lax.scan(step, state, (rc1, rc2))
    return jnp.concatenate([state[None], states], axis=0)


# ---------------------------------------------------------------------------
# host-facing wrappers
# ---------------------------------------------------------------------------


def _absorb(inputs: Sequence[int]) -> jnp.ndarray:
    b = len(inputs)
    flat = [v % P for v in inputs] + [0] * b  # register 0 = input, register 1 = 0
    arr = pack(flat).reshape(8, 2, b)
    return fo.to_mont(jnp.asarray(arr))


def hash_batch(inputs: Sequence[int]) -> List[int]:
    """Batched Rescue-Prime hash of many field elements."""
    state = permutation_mont(_absorb(inputs))
    out = fo.from_mont(state[:, 0, :])
    return unpack(np.asarray(jax.device_get(out)))


def trace_batch(inputs: Sequence[int]) -> np.ndarray:
    """Batched traces: numpy object array of shape (B, N+1, m) of ints."""
    b = len(inputs)
    states = trace_mont(_absorb(inputs))  # (N+1, 8, 2, B)
    plain = fo.from_mont(jnp.moveaxis(states, 1, 0).reshape(8, -1))
    vals = unpack(np.asarray(jax.device_get(plain)))
    # layout after reshape: index = ((cycle * 2) + reg) * b + batch
    out = np.empty((b, RESCUE_N + 1, RESCUE_M), dtype=object)
    for c in range(RESCUE_N + 1):
        for r in range(RESCUE_M):
            base = (c * RESCUE_M + r) * b
            for i in range(b):
                out[i, c, r] = vals[base + i]
    return out
