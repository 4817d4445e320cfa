"""Batched Montgomery arithmetic over GF(p) for the TPU VPU (jnp level).

Representation: uint32 arrays of shape ``(8, *batch)``, eight 16-bit limbs,
little-endian (see :mod:`stark_tpu.ops.limbs`).  Elements in mul-heavy
pipelines are kept in Montgomery form x~ = x * 2^128 mod p; `mont_mul`
computes x~ * y~ * 2^-128 = (xy)~.

The CIOS reduction exploits p = 0xCB80 << 112 | 1:

* p == 1 (mod 2^16)  =>  per-step quotient m = (-t0) mod 2^16;
* m * p touches only limbs 0, 7, 8  =>  9 multiplies per CIOS step
  (8 for a*b_i + 1 for m * 0xCB80) instead of 16.

Carry discipline: partial products are split into 16-bit halves and
accumulated WITHOUT intra-step propagation; limb magnitudes stay < 2^21
over the 8 CIOS steps (uint32 lanes have 11+ bits of slack), so a single
carry sweep at the end suffices.  This is the redundant-arithmetic trick
that makes the kernel ~70 vector multiplies total.

Everything here is jit-compatible and shape-polymorphic over the batch
dims; the same code runs under `shard_map` for multi-chip execution.

Semantics are differential-tested against the host golden model
(:mod:`stark_tpu.field`); the reference scalar semantics are
reference: field.rs:16-147.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..params import (
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    P,
    P_TOP,
    R2_MOD_P,
    R_MOD_P,
)
from .limbs import limbs_of

# np (not jnp) scalar: a module-level jnp constant would initialize the
# XLA backend at import time, which breaks multi-process bring-up
# (jax.distributed.initialize must run before any backend use)
_MASK = np.uint32(LIMB_MASK)
_P_LIMBS = tuple(limbs_of(P))
_R2 = np.array(limbs_of(R2_MOD_P), dtype=np.uint32)
_R1 = np.array(limbs_of(R_MOD_P), dtype=np.uint32)
_ONE_PLAIN = np.array(limbs_of(1), dtype=np.uint32)


def _bcast_const(limbs: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a constant's (8,) limb vector against a (8, *batch) array."""
    shape = (NUM_LIMBS,) + (1,) * (like.ndim - 1)
    return jnp.asarray(limbs.reshape(shape), dtype=jnp.uint32)


def zeros_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(a)


def mont_one(like: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form of 1 (= R mod p), broadcast against `like`."""
    return jnp.broadcast_to(_bcast_const(_R1, like), like.shape)


# ---------------------------------------------------------------------------
# carry plumbing
# ---------------------------------------------------------------------------


def _carry_sweep(t: list) -> list:
    """Propagate carries so every limb is < 2^16.  t limbs must be < 2^32."""
    out = []
    carry = jnp.zeros_like(t[0])
    for limb in t:
        s = limb + carry
        out.append(s & _MASK)
        carry = s >> LIMB_BITS
    out.append(carry)  # may be nonzero; caller decides
    return out


def _sub_p(t: list) -> list:
    """t - p over len(t) 16-bit limbs; returns (diff limbs, borrow)."""
    p_limbs = list(_P_LIMBS) + [0] * (len(t) - NUM_LIMBS)
    diff = []
    borrow = jnp.zeros_like(t[0])
    for i, limb in enumerate(t):
        need = jnp.uint32(p_limbs[i]) + borrow
        b = (limb < need).astype(jnp.uint32)
        diff.append((limb - need) & _MASK)
        borrow = b
    return diff, borrow


def _select(cond: jnp.ndarray, a: list, b: list) -> list:
    """Per-element select between two limb lists (cond: uint32 0/1)."""
    c = cond.astype(jnp.bool_)
    return [jnp.where(c, x, y) for x, y in zip(a, b)]


def _canonicalize(t: list) -> jnp.ndarray:
    """Reduce a value < 2p given as 9 propagated limbs to canonical 8 limbs."""
    diff, borrow = _sub_p(t)
    # borrow == 0  <=>  t >= p  => take diff
    keep_diff = borrow == 0
    out = [jnp.where(keep_diff, d, o) for d, o in zip(diff[:NUM_LIMBS], t[:NUM_LIMBS])]
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# add / sub / neg (plain or Montgomery form — linear ops are form-agnostic)
# ---------------------------------------------------------------------------


def _common_shape(a: jnp.ndarray, b: jnp.ndarray):
    """Broadcast to a common shape up front (see _mont_mul_raw docstring)."""
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    return a, b


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p on canonical limb arrays."""
    a, b = _common_shape(a, b)
    t = [a[i] + b[i] for i in range(NUM_LIMBS)]
    t = _carry_sweep(t)  # 9 limbs, top is 0/1
    out = _canonicalize(t)
    # WIDE graphs (parallel mont_mul chains joined by adds) re-trigger the
    # XLA:CPU fusion blow-up even with per-product barriers (measured: 10
    # joined 2-mul chains never finished compiling; with barriered adds 80
    # muls compile in 16 s) — fence the joins too, CPU only
    if _fusion_barriers():
        out = jax.lax.optimization_barrier(out)
    return out


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p on canonical limb arrays."""
    a, b = _common_shape(a, b)
    diff = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        need = b[i] + borrow
        new_borrow = (a[i] < need).astype(jnp.uint32)
        diff.append((a[i] - need) & _MASK)
        borrow = new_borrow
    # if borrowed, add p back
    added = []
    carry = jnp.zeros_like(a[0])
    for i in range(NUM_LIMBS):
        s = diff[i] + jnp.uint32(_P_LIMBS[i]) + carry
        added.append(s & _MASK)
        carry = s >> LIMB_BITS
    out = _select(borrow, added, diff)
    out = jnp.stack(out)
    if _fusion_barriers():  # see add()
        out = jax.lax.optimization_barrier(out)
    return out


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p."""
    return sub(jnp.zeros_like(a), a)


@jax.jit
def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Boolean batch: element == 0 (canonical form assumed)."""
    acc = a[0]
    for i in range(1, NUM_LIMBS):
        acc = acc | a[i]
    return acc == 0


# ---------------------------------------------------------------------------
# byte-stream unpack (randomizer draws)
# ---------------------------------------------------------------------------

_B0_LIMB_TABLE = None


def _b0_limb_table() -> "np.ndarray":
    """(256, 8) uint32 limb rows of ``b << 128 mod p`` per byte b."""
    global _B0_LIMB_TABLE
    if _B0_LIMB_TABLE is None:

        tab = np.empty((256, NUM_LIMBS), np.uint32)
        for b in range(256):
            v = (b << 128) % P
            for l in range(NUM_LIMBS):
                tab[b, l] = (v >> (LIMB_BITS * l)) & LIMB_MASK
        _B0_LIMB_TABLE = tab
    return _B0_LIMB_TABLE


@jax.jit
def _be17_limbs(
    digits: jnp.ndarray, b0: jnp.ndarray, table: jnp.ndarray
) -> jnp.ndarray:
    """(4, N) little-endian 32-bit digits of v0 + (N,) leading byte ->
    (8, N) canonical plain limbs of ``(b0 << 128 | v0) mod p``.  Same
    reduction as :func:`stark_tpu.ops.limbs.pack_be17` (v0 < 2^128 < 2p
    needs one conditional subtract; b0*2^128 mod p via the byte table),
    moved on-device — the host pack was 0.2-0.3 s per flagship prove."""
    limbs = []
    for k in range(4):
        limbs.append(digits[k] & _MASK)
        limbs.append(digits[k] >> LIMB_BITS)
    v0c = _canonicalize(limbs + [jnp.zeros_like(limbs[0])])
    term = table[b0].T  # (8, N) canonical
    return add(v0c, term)


def be17_device_limbs(raw: bytes) -> jnp.ndarray:
    """Concatenated 17-byte big-endian chunks -> device (8, N) canonical
    plain limb array (the randomizer coefficient upload, 2.5 MB instead
    of 16 MB of pre-split limbs at 2^19 coefficients)."""
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 17)
    b0 = a[:, 0].astype(np.int32)
    le = np.ascontiguousarray(a[:, 1:][:, ::-1])
    d = np.ascontiguousarray(le.view("<u4").T)  # (4, N) digits of v0
    return _be17_limbs(
        jnp.asarray(d), jnp.asarray(b0), jnp.asarray(_b0_limb_table())
    )


# ---------------------------------------------------------------------------
# Montgomery multiply
# ---------------------------------------------------------------------------


def _mont_mul_raw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """CIOS Montgomery product of two canonical limb arrays.

    Operands are broadcast to a common shape up front: letting the limb
    accumulators grow shape mid-loop (e.g. (1,) -> (N,)) produces a graph
    that XLA:CPU takes pathologically long to compile."""
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    az = [a[i] for i in range(NUM_LIMBS)]
    t = [jnp.zeros_like(az[0]) for _ in range(NUM_LIMBS + 1)]
    for i in range(NUM_LIMBS):
        bi = b[i]
        # t += a * b_i   (split products into 16-bit halves; no carries yet)
        for j in range(NUM_LIMBS):
            prod = az[j] * bi
            t[j] = t[j] + (prod & _MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        # Montgomery quotient: p == 1 (mod 2^16) => m = -t0 mod 2^16
        m = (jnp.uint32(0) - t[0]) & _MASK
        # t += m * p  with p = [1, 0...0, 0xCB80]
        t0 = t[0] + m  # low limb becomes == 0 (mod 2^16)
        mp = m * jnp.uint32(P_TOP)
        t[NUM_LIMBS - 1] = t[NUM_LIMBS - 1] + (mp & _MASK)
        t[NUM_LIMBS] = t[NUM_LIMBS] + (mp >> LIMB_BITS)
        # shift one limb right, folding the carry of the dead low limb
        carry = t0 >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t0)]
        t[0] = t[0] + carry
    t = _carry_sweep(t[: NUM_LIMBS + 1])[: NUM_LIMBS + 1]
    out = _canonicalize(t)
    if _fusion_barriers():
        out = jax.lax.optimization_barrier(out)
    return out


_BARRIERS = None


def _fusion_barriers() -> bool:
    """Whether to fence each mont_mul with an optimization barrier.

    XLA:CPU's compile time grows ~50x per additional mont_mul fused into
    one cluster (measured: 1 mul 1s, 2 muls 4.5s, 3 muls 227s); a barrier
    after each product keeps clusters bounded and compile time linear.
    XLA:TPU does not exhibit the blow-up and wants the fusion, so barriers
    default to CPU only.  Override with STARK_TPU_XLA_BARRIERS=0/1."""
    global _BARRIERS
    if _BARRIERS is None:
        import os

        env = os.environ.get("STARK_TPU_XLA_BARRIERS")
        if env is not None:
            _BARRIERS = env == "1"
        else:
            try:
                _BARRIERS = jax.default_backend() == "cpu"
            except Exception:
                _BARRIERS = False
    return _BARRIERS


mont_mul = jax.jit(_mont_mul_raw)


@jax.jit
def mont_sqr(a: jnp.ndarray) -> jnp.ndarray:
    return _mont_mul_raw(a, a)


@jax.jit
def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Plain residue -> Montgomery form: REDC(a * R^2)."""
    return _mont_mul_raw(a, jnp.broadcast_to(_bcast_const(_R2, a), a.shape))


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> plain residue: REDC(a * 1)."""
    return _mont_mul_raw(a, jnp.broadcast_to(_bcast_const(_ONE_PLAIN, a), a.shape))


# ---------------------------------------------------------------------------
# fixed-exponent powers / inversion
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=1)
def mont_pow_fixed(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a~ ^ exponent (result in Montgomery form) for a static Python-int
    exponent.

    Small exponents: MSB-first square-and-multiply flattened to single
    `mont_mul` steps.  Large exponents (>= 2^32, e.g. the Rescue inverse
    S-box's 1/3 and Fermat's p-2): 4-bit windowed exponentiation — a
    15-entry power table built up front, then per hex digit 4 squarings
    plus at most one multiply by a table entry, ~31% fewer multiplies
    than binary (127 sq + ~32 muls + 14 table muls for 128-bit
    exponents).

    Either way the scan body contains exactly ONE mont_mul: XLA fuses a
    one-multiply body into a tight loop, while a two-multiply body falls
    off the fusion cliff (measured ~500x slower on the CPU backend).

    jit-cached per (shape, exponent) so repeated calls do not retrace."""
    if exponent == 0:
        return mont_one(a)
    if exponent == 1:
        return a
    if exponent < (1 << 32):
        bits = bin(exponent)[2:]
        # schedule[i] == True -> square (acc *= acc); False -> acc *= base
        schedule = []
        for bit in bits[1:]:
            schedule.append(True)
            if bit == "1":
                schedule.append(False)
        flags = jnp.asarray(np.array(schedule, dtype=np.bool_))

        def step(carry, is_sqr):
            acc, base = carry
            operand = jnp.where(is_sqr, acc, base)
            acc = _mont_mul_raw(acc, operand)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(step, (a, a), flags)
        return acc

    # windowed: powers[k] = a^(k+1), k = 0..14 (table built up front)
    powers = [a]
    for _ in range(14):
        powers.append(_mont_mul_raw(powers[-1], a))

    digits = []
    e = exponent
    while e:
        digits.append(e & 0xF)
        e >>= 4
    digits.reverse()  # MSB-first; digits[0] != 0

    if jax.default_backend() != "cpu":
        # accelerators: ONE scan over the hex digits, the table entry
        # gathered dynamically per step.  The unrolled digit loop made
        # every consumer a giant module (mont_inv at 2^20 alone cost
        # ~80 s to compile; the fused interpolation, which inlines two
        # of these, ~600 s) — the rolled form compiles in seconds and
        # the per-step (15, 8, n) gather is ~1 GB of HBM traffic at
        # 2^20, noise next to the multiplies.  (The one-multiply-per-
        # scan-body rule below is an XLA:CPU fusion cliff; the TPU
        # backend handles a 5-multiply body fine.)
        table = jnp.stack(powers)  # (15, 8, n)
        digit_arr = jnp.asarray(
            np.array(digits[1:], dtype=np.int32)
        )

        def dstep(acc, d):
            for _ in range(4):
                acc = _mont_mul_raw(acc, acc)
            sel = jax.lax.dynamic_index_in_dim(
                table, jnp.maximum(d - 1, 0), keepdims=False
            )
            mult = _mont_mul_raw(acc, sel)
            return jnp.where(d > 0, mult, acc), None

        acc, _ = jax.lax.scan(dstep, powers[digits[0] - 1], digit_arr)
        return acc

    def sqr4(acc):
        # four squarings as one tiny single-multiply scan (keeps every
        # scan body at one mont_mul; see the fusion-cliff note above)
        def step(x, _):
            return _mont_mul_raw(x, x), None

        out, _ = jax.lax.scan(step, acc, None, length=4)
        return out

    # per hex digit: 4 squarings, then a multiply by a STATIC table entry
    # (XLA:CPU keeps the unrolled schedule: every scan body must stay at
    # one multiply there)
    acc = powers[digits[0] - 1]
    for d in digits[1:]:
        acc = sqr4(acc)
        if d:
            acc = _mont_mul_raw(acc, powers[d - 1])
    return acc


def mont_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via Fermat: a~^(p-2) = (a^-1)~.

    Division-free, constant-depth, fully data-parallel — the TPU-native
    replacement for the reference's extended Euclid (field.rs:67-93).
    Zero maps to zero (no exception semantics on device)."""
    return mont_pow_fixed(a, P - 2)


# ---------------------------------------------------------------------------
# host-facing conveniences (non-jit paths for tests/tools)
# ---------------------------------------------------------------------------


def pow_plain(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """Plain-form power: converts in/out of Montgomery around the chain."""
    return from_mont(mont_pow_fixed(to_mont(a), exponent))
