"""On-device Fiat-Shamir transcript pieces for the fused FRI cascade.

Bridges the device Merkle roots (:mod:`stark_tpu.ops.device_merkle`),
the device Shake256 (:mod:`stark_tpu.ops.device_keccak`) and the limb
field arithmetic (:mod:`stark_tpu.ops.field_ops`):

* ``hex_words``   — 32-byte digest (as 8 LE uint32 words) -> the 64
  lowercase-hex ASCII bytes the transcript stores (reference pushes
  ``hex::encode(root)`` strings, fri.rs:119-120);
* ``alpha_mont_from_fs`` — 32 Fiat-Shamir bytes -> the fold challenge
  as a Montgomery limb column.  Sampling is the reference's big-endian
  byte fold mod p (field.rs:110-116): with R = 2^128 the fold of 32
  bytes splits as v = hi*2^128 + lo, and hi*2^128 mod p is exactly
  ``to_mont(hi)`` read as a plain residue — one REDC each for hi and
  lo, one modular add, one REDC back to Montgomery form.

Bit-identity with the host transcript is pinned by
tests/test_device_fs.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import field_ops as fo

# ASCII lowercase hex alphabet as a lookup table
_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def digest_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """(8,) uint32 LE digest words -> (32,) uint8 digest bytes."""
    w = words.astype(jnp.uint32)
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    return ((w[:, None] >> shifts[None, :]) & jnp.uint32(0xFF)).reshape(
        32
    ).astype(jnp.uint8)


def hex_words(words: jnp.ndarray) -> jnp.ndarray:
    """(8,) uint32 LE digest words -> (64,) uint8 lowercase hex ASCII."""
    b = digest_bytes(words).astype(jnp.uint32)
    table = jnp.asarray(_HEX)
    out = jnp.empty(64, dtype=jnp.uint8)
    out = out.at[0::2].set(table[b >> 4])
    out = out.at[1::2].set(table[b & 0xF])
    return out


def _limbs_from_be_bytes(b: jnp.ndarray) -> jnp.ndarray:
    """(16,) uint8 big-endian bytes -> (8, 1) uint32 16-bit limb column
    (limb k = bits 16k..16k+15 of the big-endian value)."""
    v = b.astype(jnp.uint32)
    lo_idx = np.asarray([15 - 2 * k for k in range(8)], dtype=np.int32)
    hi_idx = np.asarray([14 - 2 * k for k in range(8)], dtype=np.int32)
    limbs = v[jnp.asarray(lo_idx)] | (v[jnp.asarray(hi_idx)] << 8)
    return limbs.reshape(8, 1)


def alpha_mont_from_fs(words: jnp.ndarray) -> jnp.ndarray:
    """32 Fiat-Shamir digest bytes (as 8 LE uint32 words) -> the sampled
    field element (big-endian fold mod p) as an (8, 1) Montgomery limb
    column — the exact value of
    ``FieldElement.sample(fs_bytes)`` converted with ``to_mont``."""
    b = digest_bytes(words)
    hi = _limbs_from_be_bytes(b[:16])
    lo = _limbs_from_be_bytes(b[16:])
    # to_mont(hi) = hi * 2^128 mod p read as plain; from_mont(to_mont(lo))
    # = lo mod p (lo < 2^128 may exceed p)
    plain = fo.add(fo.to_mont(hi), fo.from_mont(fo.to_mont(lo)))
    return fo.to_mont(plain)
