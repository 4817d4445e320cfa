"""Device-resident interpolation/evaluation on geometric progressions.

The host chirp interpolation (:mod:`stark_tpu.geometric`) is
mathematically O(M(n)) but runs its O(n) table constructions as Python
big-int loops and round-trips every NTT product through host coefficient
lists — at a 2^16-step trace that cost ~8 s per register, nearly all of
it ~10 MB/s tunnel transfers and Python modpows (the round-2 fib-2^16
stage breakdown).  This module runs the SAME Bostan-Schost algorithm
entirely on the device:

* every power table is a structured recurrence, not a loop of modpows:
  q^{T(k)} (T(k)=k(k-1)/2) is the exclusive prefix product of the
  geometric series q^k, and prefix products are log-depth Hillis-Steele
  rounds of batched Montgomery multiplies;
* q-factorials are prefix products of (q^m - 1); Lagrange denominators
  use q^{e_i} = q^{-T(i)} * (q^{n-2})^i (e_i = T(i)+i(n-1-i) mod p-1);
* batch inversion is the existing Fermat kernel; the three polynomial
  products are direct device NTT products (no host coefficient lists).

Bit-identical to :func:`stark_tpu.geometric.geometric_interpolate`
(pinned by tests/test_geometric_device.py).  Reference context: the Rust
implementation interpolates traces with O(n^2) Lagrange
(univariate_poly.rs:147-164); the trace domain {omicron^i} is geometric.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import NUM_LIMBS, P
from . import field_ops as fo
from .backend import best_plan
from .device_prover import geometric_table
from .ntt import _mont_pack, get_plan


def _mont_one(n: int) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.asarray(_mont_pack([1]))[:, :1], (NUM_LIMBS, n)
    )


def prefix_mont_mul(arr: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products along axis 1 of an (8, n) Montgomery
    array: log2(n) Hillis-Steele rounds of full-width mont_muls."""
    n = arr.shape[1]
    shift = 1
    while shift < n:
        pad = _mont_one(shift)
        shifted = jnp.concatenate([pad, arr[:, :-shift]], axis=1)
        arr = fo.mont_mul(arr, shifted)
        shift *= 2
    return arr


def exclusive_prefix_mont_mul(arr: jnp.ndarray) -> jnp.ndarray:
    """[1, a0, a0*a1, ...] — prefix products shifted right by one."""
    n = arr.shape[1]
    shifted = jnp.concatenate([_mont_one(1), arr[:, : n - 1]], axis=1)
    return prefix_mont_mul(shifted)


def chirp_table(q: int, length: int) -> jnp.ndarray:
    """(8, length) Montgomery table of q^{T(k)}, T(k) = k(k-1)/2 —
    the exclusive prefix product of the geometric series q^k."""
    geo = geometric_table(q % P, 1, length)
    return exclusive_prefix_mont_mul(geo)


def _product_plan(total_len: int):
    n = 1 << (total_len - 1).bit_length()
    return n, best_plan(n)


def device_poly_product(
    a: jnp.ndarray, b: jnp.ndarray, out_len: int, tabs=None
) -> jnp.ndarray:
    """NTT product of two (8, la)/(8, lb) Montgomery coefficient arrays,
    truncated to out_len coefficients — no host round trip.

    ``tabs`` = (forward_tables, inverse_tables) from the product plan's
    ``op_tables`` — REQUIRED when tracing inside an outer jit, so the
    twiddle tables ride in as arguments instead of ~MB module constants;
    None (eager/top-level use) routes through the plan's own jits."""
    la, lb = a.shape[1], b.shape[1]
    n, plan = _product_plan(la + lb - 1)
    pad_a = jnp.zeros((NUM_LIMBS, n - la), dtype=jnp.uint32)
    pad_b = jnp.zeros((NUM_LIMBS, n - lb), dtype=jnp.uint32)
    ca = jnp.concatenate([a, pad_a], axis=1)
    cb = jnp.concatenate([b, pad_b], axis=1)
    if tabs is None:
        fa = plan.forward(ca)
        fb = plan.forward(cb)
        return plan.inverse(fo.mont_mul(fa, fb))[:, :out_len]
    fwd_t, inv_t = tabs
    fa = plan.apply(ca, fwd_t, False)
    fb = plan.apply(cb, fwd_t, False)
    return plan.apply(fo.mont_mul(fa, fb), inv_t, True)[:, :out_len]


def product_tabs(total_len: int):
    """(forward, inverse) op_tables of the plan device_poly_product will
    pick for ``total_len`` — build OUTSIDE a trace, pass through the jit."""
    _, plan = _product_plan(total_len)
    return (plan.op_tables(False), plan.op_tables(True))


def device_chirp_eval(
    coeffs: jnp.ndarray, q: int, m: int, tabs=None
) -> jnp.ndarray:
    """[p(q^t) for t < m] of an (8, n) Montgomery coefficient array
    (same correlation as geometric._chirp_eval)."""
    n = coeffs.shape[1]
    q_inv = pow(q, -1, P)
    f = fo.mont_mul(coeffs, chirp_table(q_inv, n))
    g = chirp_table(q, n + m - 1)
    conv = device_poly_product(f[:, ::-1], g, n - 1 + m, tabs)
    return fo.mont_mul(conv[:, n - 1 : n - 1 + m], chirp_table(q_inv, m))


def horner_eval(coeff_values, x_tab: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a LOW-degree polynomial (plain-int coefficients,
    lowest-first) pointwise over an (8, n) Montgomery x table — used for
    boundary interpolant/zeroifier codewords (degree ~ #boundary points)."""
    n = x_tab.shape[1]
    if not coeff_values:
        return jnp.zeros((NUM_LIMBS, n), dtype=jnp.uint32)
    consts = [
        jnp.broadcast_to(
            jnp.asarray(_mont_pack([c % P]))[:, :1], (NUM_LIMBS, n)
        )
        for c in coeff_values
    ]
    acc = consts[-1]
    for c in reversed(consts[:-1]):
        acc = fo.add(fo.mont_mul(acc, x_tab), c)
    return acc


def _signed(arr: jnp.ndarray, flip: np.ndarray) -> jnp.ndarray:
    """Negate (mod p) the columns where flip is True."""
    return jnp.where(jnp.asarray(flip)[None, :], fo.neg(arr), arr)


@lru_cache(maxsize=16)
def _interp_jit(n: int, start: int, q: int):
    """One compiled executable for the whole interpolation — the
    host-orchestrated version issued ~80 separate device dispatches per
    trace register (every prefix-product round, table build and NTT pass
    its own call, each paying per-dispatch tunnel overhead)."""
    # build the product plans + table pytrees OUTSIDE the trace (plan
    # construction materializes twiddle tables host-side, which a tracer
    # cannot) and thread the tables through the jit as arguments
    chirp_tabs = product_tabs(n + (n + n - 1) - 1)  # chirp-eval convolution
    comb_tabs = product_tabs((n + 1) + n - 1)  # numerator combine
    fn = jax.jit(
        lambda ys, t1, t2: _interpolate_body(ys, start, q, t1, t2)
    )
    return lambda ys: fn(ys, chirp_tabs, comb_tabs)


def _fuse_interp() -> bool:
    """Fuse the whole interpolation into one executable on accelerators;
    on XLA:CPU the fused graph's chained Montgomery multiplies blow up
    compile time superlinearly (measured 152 s at n=64 — the same cliff
    as field_ops' barrier note), so the CPU path keeps per-op dispatch
    (dispatch overhead is nil without the tunnel)."""
    import os

    env = os.environ.get("STARK_TPU_FUSE_INTERP")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"


def device_geometric_interpolate(
    ys: jnp.ndarray, start: int, q: int
) -> jnp.ndarray:
    """Montgomery coefficient array (8, n) of the unique interpolant
    through (start * q^i, ys[i]) — the Bostan-Schost chirp interpolation
    of :func:`stark_tpu.geometric.geometric_interpolate`, device-resident
    and (on accelerators) fused into a single dispatch."""
    n = int(ys.shape[1])
    if n == 1:
        return ys
    if _fuse_interp():
        return _interp_jit(n, start % P, q % P)(ys)
    return _interpolate_body(ys, start % P, q % P)


def _interpolate_body(
    ys: jnp.ndarray, start: int, q: int, chirp_tabs=None, comb_tabs=None
) -> jnp.ndarray:
    n = ys.shape[1]
    q_inv = pow(q, -1, P)

    # q-factorials: fact[k] = prod_{m=1..k} (q^m - 1), k = 0..n
    one = _mont_one(n)
    qpow = geometric_table(q, q, n)  # q^{m+1}?? -> q * q^m = q^(m+1), m=0..n-1
    terms = fo.sub(qpow, one)  # q^m - 1 for m = 1..n
    fact_ext = jnp.concatenate(
        [_mont_one(1), prefix_mont_mul(terms)], axis=1
    )  # (8, n+1): fact[0..n]
    fact = fact_ext[:, :n]

    # Lagrange denominators:
    # d[i] = (-1)^(n-1-i) q^{e_i} fact[i] fact[n-1-i],
    # e_i = T(i) + i(n-1-i) = -T(i) + i(n-2)  (mod p-1)
    qe = fo.mont_mul(
        chirp_table(q_inv, n),
        geometric_table(pow(q, n - 2, P), 1, n),
    )
    d = fo.mont_mul(qe, fo.mont_mul(fact, fact[:, ::-1]))
    idx = np.arange(n)
    d = _signed(d, ((n - 1 - idx) & 1) == 1)
    u = fo.mont_mul(ys, fo.mont_inv(d))

    # h_t = sum_i u_i q^{it}
    h = device_chirp_eval(u, q, n, chirp_tabs)

    # vanishing polynomial Z via q-binomials:
    # z[k] = (-1)^(n-k) q^{T(n-k)} fact[n] / (fact[k] fact[n-k])
    inv_fact = fo.mont_inv(fact_ext)
    cq = fo.mont_mul(
        jnp.broadcast_to(fact_ext[:, n : n + 1], (NUM_LIMBS, n + 1)),
        fo.mont_mul(inv_fact, inv_fact[:, ::-1]),
    )
    z = fo.mont_mul(chirp_table(q, n + 1)[:, ::-1], cq)
    kidx = np.arange(n + 1)
    z = _signed(z, ((n - kidx) & 1) == 1)

    # numerator combine: N_d = sum_t Z_{d+1+t} h_t
    conv = device_poly_product(z, h[:, ::-1], 2 * n, comb_tabs)
    g_coeffs = conv[:, n : 2 * n]

    if start != 1:
        g_coeffs = fo.mont_mul(
            g_coeffs, geometric_table(pow(start, -1, P), 1, n)
        )
    return g_coeffs
