"""Pallas TPU kernels for the device Blake2b-256 Merkle tree.

The XLA tree (:mod:`stark_tpu.ops.device_merkle`) runs the rolled
compress at ~400 ns/hash — an order of magnitude off the VPU's
arithmetic peak, lost to per-round SIGMA gathers and state
re-materialization through HBM.  These kernels keep the whole 12-round
compression in registers:

* layout: hash instances tile BOTH sublanes and lanes.  A level of w
  digests is held word-major as ``(8, w/128, 128)`` — digest word i of
  instance ``r*128 + c`` lives at ``[i, r, c]`` — so every state word
  is a full ``(Rb, 128)`` vector during the compress (the natural
  ``(8, w)`` layout would leave 7/8 sublanes idle);
* the compress itself is :func:`device_merkle.blake2b256_single_block`
  with ``unroll=True``, traced INSIDE the kernel — message "gathers"
  are register renames at trace time, and bit-identity with the XLA
  path holds by construction;
* pairing for interior levels is an even/odd lane split done BETWEEN
  kernel calls in XLA (Mosaic rejects stride-2 lane slices; the split
  is one bandwidth-light pass next to ~3.8k vector ops per hash).

``tree_levels`` builds every level from the leaf digests down to
``min_width`` in one traced function (the levels below 256 instances
fall back to the XLA compress — too narrow to tile).  Used by
:func:`device_merkle.tree_arrays_with_root` on TPU; the XLA path
remains the implementation for CPU/interpret and the bit-identity
reference (tests pin equality in interpret mode).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_merkle import _ZERO, blake2b256_single_block

import os

#: sublane rows of instances per grid block (block = _RB * 128
#: instances); round-4 A/B at 2^20 preferred RB=16 (relative ordering
#: 16 < 8,32,64; the absolute times of that sweep were floor-noise —
#: the calibrated round-5 roofline puts the full tree at 11.3 ms
#: (5.4 ns/hash), IO-bound: see benches/merkle_roofline.py)
_RB = int(os.environ.get("STARK_TPU_MERKLE_RB", "16"))

#: narrowest level the kernels handle: w/2 parents must fill >= 1 lane
#: tile of 128 and 2 sublane rows after the word-major reshape
MIN_KERNEL_WIDTH = 256


def _out_rows(words) -> jnp.ndarray:
    """8 (Rb, 128) digest words -> (8, Rb, 128) stack."""
    return jnp.stack(list(words))


def _leaf_kernel(unroll: bool):
    # interpret mode (CPU tests) uses the ROLLED compress — the unrolled
    # trace hits XLA:CPU's compile cliff — with the SIGMA table passed
    # as a kernel INPUT (a captured jnp constant is rejected); the
    # compiled TPU path unrolls, where SIGMA folds away statically
    def kernel(*refs):
        if unroll:
            d_ref, out_ref = refs
            sigma = None
        else:
            sigma_ref, d_ref, out_ref = refs
            sigma = sigma_ref[...]
        d = [d_ref[i] for i in range(4)]
        one = jnp.uint32(1)
        k = jnp.where(
            d[3] != 0, jnp.uint32(4),
            jnp.where(d[2] != 0, jnp.uint32(3),
                      jnp.where(d[1] != 0, jnp.uint32(2),
                                jnp.where(d[0] != 0, one, jnp.uint32(0)))),
        )
        sign = jnp.where(k > 0, jnp.uint32(2), one)  # Plus=2 / NoSign=1
        t = jnp.uint32(12) + jnp.uint32(4) * k
        zero = jnp.zeros_like(d[0])
        m = [
            (sign, k),
            (zero, d[0]),
            (d[1], d[2]),
            (d[3], zero),
        ] + [_ZERO] * 12
        out_ref[...] = _out_rows(
            blake2b256_single_block(m, t, unroll=unroll, sigma=sigma)
        )

    return kernel


def _level_kernel(unroll: bool):
    def kernel(*refs):
        if unroll:
            e_ref, o_ref, out_ref = refs
            sigma = None
        else:
            sigma_ref, e_ref, o_ref, out_ref = refs
            sigma = sigma_ref[...]
        left = [e_ref[i] for i in range(8)]
        right = [o_ref[i] for i in range(8)]
        m = [
            (left[0], left[1]), (left[2], left[3]),
            (left[4], left[5]), (left[6], left[7]),
            (right[0], right[1]), (right[2], right[3]),
            (right[4], right[5]), (right[6], right[7]),
        ] + [_ZERO] * 8
        out_ref[...] = _out_rows(
            blake2b256_single_block(m, 64, unroll=unroll, sigma=sigma)
        )

    return kernel


def _word_major(x: jnp.ndarray) -> jnp.ndarray:
    """(rows, w) natural -> (rows, w//128, 128) word-major tiles."""
    rows, w = x.shape
    return x.reshape(rows, w // 128, 128)


def _natural(x: jnp.ndarray) -> jnp.ndarray:
    """(8, r, 128) word-major -> (8, r*128) natural."""
    return x.reshape(8, -1)


def _rb_for(mid: int) -> int:
    """Sublane block rows for a word-major middle dim of ``mid``
    (clamped so one block never exceeds the array)."""
    rb = min(_RB, mid)
    while mid % rb:
        rb //= 2
    return max(rb, 1)


def _block_spec(rows: int, rb: int):
    return pl.BlockSpec(
        (rows, rb, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )


def _sigma_arr() -> jnp.ndarray:
    from .device_merkle import _SIGMA_FULL

    return jnp.asarray(_SIGMA_FULL)


def _sigma_spec():
    return pl.BlockSpec((12, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)


def leaf_digests_pallas(
    digits: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(4, n) plain base-2^32 digit rows -> (8, n) leaf digest words
    (bincode(FieldElement) single-block Blake2b-256 leaves)."""
    n = digits.shape[1]
    d = _word_major(digits)
    rb = _rb_for(n // 128)
    grid = (n // (128 * rb),)
    if interpret:
        out = pl.pallas_call(
            _leaf_kernel(unroll=False),
            out_shape=jax.ShapeDtypeStruct((8, n // 128, 128), jnp.uint32),
            grid=grid,
            in_specs=[_sigma_spec(), _block_spec(4, rb)],
            out_specs=_block_spec(8, rb),
            interpret=True,
        )(_sigma_arr(), d)
    else:
        out = pl.pallas_call(
            _leaf_kernel(unroll=True),
            out_shape=jax.ShapeDtypeStruct((8, n // 128, 128), jnp.uint32),
            grid=grid,
            in_specs=[_block_spec(4, rb)],
            out_specs=_block_spec(8, rb),
        )(d)
    return _natural(out)


def level_hash_pallas(
    level: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(8, w) digest level -> (8, w/2) parent level
    (H(left || right), 64-byte single blocks)."""
    w = level.shape[1]
    e = _word_major(level[:, 0::2])
    o = _word_major(level[:, 1::2])
    rb = _rb_for(w // 256)
    grid = (w // (2 * 128 * rb),)
    if interpret:
        out = pl.pallas_call(
            _level_kernel(unroll=False),
            out_shape=jax.ShapeDtypeStruct((8, w // 256, 128), jnp.uint32),
            grid=grid,
            in_specs=[_sigma_spec(), _block_spec(8, rb), _block_spec(8, rb)],
            out_specs=_block_spec(8, rb),
            interpret=True,
        )(_sigma_arr(), e, o)
    else:
        out = pl.pallas_call(
            _level_kernel(unroll=True),
            out_shape=jax.ShapeDtypeStruct((8, w // 256, 128), jnp.uint32),
            grid=grid,
            in_specs=[_block_spec(8, rb), _block_spec(8, rb)],
            out_specs=_block_spec(8, rb),
        )(e, o)
    return _natural(out)


def tree_levels(
    digits: jnp.ndarray, tail_width: int, interpret: bool = False
):
    """All tree levels from the (4, n) digit rows: list of (8, w) digest
    levels for w = n .. tail_width (device-resident for openings) plus
    the remaining rows down to the (8,) root words.  Levels narrower
    than MIN_KERNEL_WIDTH use the XLA compress (device_merkle.level_hash)
    — identical bytes, just not worth tiling."""
    from .device_merkle import level_hash

    n = digits.shape[1]
    levels: List[jnp.ndarray] = []
    if n >= MIN_KERNEL_WIDTH and n % 128 == 0:
        cur = leaf_digests_pallas(digits, interpret)
    else:
        from .device_merkle import leaf_digests_from_digits

        cur = jnp.stack(leaf_digests_from_digits(digits))
    levels.append(cur)
    w = n
    while w > 1:
        if w >= 2 * MIN_KERNEL_WIDTH and (w // 2) % 128 == 0:
            cur = level_hash_pallas(cur, interpret)
        else:
            cur = jnp.stack(level_hash([cur[i] for i in range(8)]))
        w //= 2
        levels.append(cur)
    root = jnp.stack([levels[-1][i].reshape(()) for i in range(8)])
    kept = tuple(lv for lv in levels if lv.shape[1] >= tail_width)
    return kept, root
