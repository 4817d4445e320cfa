"""Pallas TPU kernel for the FRI fold.

The fold is the prover's most bandwidth-sensitive pass: each round reads
the full codeword once and writes half of it,

    out[i] = 1/2 [ (1 + a*inv_i) u_i + (1 - a*inv_i) v_i ],
    u = codeword[:n/2], v = codeword[n/2:]

The XLA path (:mod:`stark_tpu.ops.fold`) materializes several limb-array
intermediates; this kernel does the whole computation per block in VMEM:
one pass over u, v and the inverse table, one write of the output, with
the Montgomery arithmetic unrolled inside the kernel (4 mont_muls + adds).

Grid: 1-D over output chunks.  Each program loads (8, BLOCK) tiles of u,
v, inv (three inputs sharing the same index map on the last axis) plus the
(8, 1) alpha, and writes one (8, BLOCK) output tile.

Falls back transparently if Pallas is unavailable; bit-equality with the
XLA path is pinned by tests (interpret mode on CPU, compiled on TPU).

NOT wired into the production fold path on purpose: honest
(fetch-bracketed) timing has the XLA ``fold_mont`` ahead at both 2^18
(0.40 vs 0.42 ms) and 2^20 (1.3 vs 1.8 ms) — XLA's fusion of the 4
mont_muls + adds is already optimal for this bandwidth-light op
(benches/crossover_retime.py).  The kernel is kept as the reference
implementation for in-VMEM Montgomery arithmetic (its ``_k_*`` helpers
are the building blocks of the Pallas NTT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, P, P_TOP
from . import field_ops as fo

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKI = LIMB_MASK  # plain ints: Pallas kernels must not capture array constants


def _k_mont_mul(a, b):
    """Montgomery product on (8, BLOCK) register values (kernel-side copy
    of field_ops._mont_mul_raw without the barrier machinery)."""
    az = [a[i] for i in range(NUM_LIMBS)]
    t = [jnp.zeros_like(az[0]) for _ in range(NUM_LIMBS + 1)]
    for i in range(NUM_LIMBS):
        bi = b[i]
        for j in range(NUM_LIMBS):
            prod = az[j] * bi
            t[j] = t[j] + (prod & _MASKI)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = (0 - t[0]) & _MASKI
        t0 = t[0] + m
        mp = m * P_TOP
        t[NUM_LIMBS - 1] = t[NUM_LIMBS - 1] + (mp & _MASKI)
        t[NUM_LIMBS] = t[NUM_LIMBS] + (mp >> LIMB_BITS)
        carry = t0 >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t0)]
        t[0] = t[0] + carry
    # carry sweep
    out = []
    carry = jnp.zeros_like(t[0])
    for limb in t[: NUM_LIMBS + 1]:
        s = limb + carry
        out.append(s & _MASKI)
        carry = s >> LIMB_BITS
    t = out
    # conditional subtract p
    p_limbs = [1] + [0] * 6 + [P_TOP, 0]
    diff = []
    borrow = jnp.zeros_like(t[0])
    for i in range(NUM_LIMBS + 1):
        need = p_limbs[i] + borrow
        b_ = (t[i] < need).astype(jnp.uint32)
        diff.append((t[i] - need) & _MASKI)
        borrow = b_
    keep_diff = borrow == 0
    out = jnp.stack(
        [jnp.where(keep_diff, d, o) for d, o in zip(diff[:NUM_LIMBS], t[:NUM_LIMBS])]
    )
    if fo._fusion_barriers():
        # CPU-only (tests/interpret mode): cap XLA:CPU fusion clusters —
        # never active when Mosaic compiles the kernel for TPU
        out = jax.lax.optimization_barrier(out)
    return out


def _k_add(a, b):
    t = []
    carry = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        s = a[i] + b[i] + carry
        t.append(s & _MASKI)
        carry = s >> LIMB_BITS
    t.append(carry)
    p_limbs = [1] + [0] * 6 + [P_TOP, 0]
    diff = []
    borrow = jnp.zeros_like(t[0])
    for i in range(NUM_LIMBS + 1):
        need = p_limbs[i] + borrow
        b_ = (t[i] < need).astype(jnp.uint32)
        diff.append((t[i] - need) & _MASKI)
        borrow = b_
    keep_diff = borrow == 0
    return jnp.stack(
        [jnp.where(keep_diff, d, o) for d, o in zip(diff[:NUM_LIMBS], t[:NUM_LIMBS])]
    )


def _k_sub(a, b):
    diff = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        need = b[i] + borrow
        nb = (a[i] < need).astype(jnp.uint32)
        diff.append((a[i] - need) & _MASKI)
        borrow = nb
    p_limbs = [1] + [0] * 6 + [P_TOP]
    added = []
    carry = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        s = diff[i] + p_limbs[i] + carry
        added.append(s & _MASKI)
        carry = s >> LIMB_BITS
    sel = borrow.astype(jnp.bool_)
    return jnp.stack([jnp.where(sel, x, y) for x, y in zip(added, diff)])


def _fold_kernel(u_ref, v_ref, inv_ref, alpha_ref, one_ref, twoinv_ref, out_ref):
    u = u_ref[...]
    v = v_ref[...]
    inv = inv_ref[...]
    alpha = jnp.broadcast_to(alpha_ref[...], u.shape)
    one = jnp.broadcast_to(one_ref[...], u.shape)
    two_inv = jnp.broadcast_to(twoinv_ref[...], u.shape)
    ai = _k_mont_mul(alpha, inv)
    left = _k_mont_mul(_k_add(one, ai), u)
    right = _k_mont_mul(_k_sub(one, ai), v)
    out_ref[...] = _k_mont_mul(two_inv, _k_add(left, right))


def fold_mont_pallas(
    codeword: jnp.ndarray,
    alpha: jnp.ndarray,
    inv_table: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fold a Montgomery (8, N) codeword to (8, N/2) with the Pallas kernel."""
    n = codeword.shape[1]
    half = n // 2
    block = min(block, half)
    assert half % block == 0, "half codeword must be divisible by block"
    u = codeword[:, :half]
    v = codeword[:, half:]
    alpha_b = jnp.broadcast_to(alpha, (NUM_LIMBS, 1))
    from .ntt import _mont_pack

    one = jnp.asarray(_mont_pack([1]))
    two_inv = jnp.asarray(_mont_pack([pow(2, -1, P)]))

    grid = (half // block,)
    data_spec = pl.BlockSpec(
        (NUM_LIMBS, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    small_spec = pl.BlockSpec(
        (NUM_LIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _fold_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, half), jnp.uint32),
        grid=grid,
        in_specs=[data_spec, data_spec, data_spec, small_spec, small_spec, small_spec],
        out_specs=data_spec,
        interpret=interpret,
    )(u, v, inv_table, alpha_b, one, two_inv)
