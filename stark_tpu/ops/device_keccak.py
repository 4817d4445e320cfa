"""Device-resident Shake256 (FIPS 202) for on-device Fiat-Shamir.

The FRI commit cascade is a strict alternation of device compute (Merkle
tree over the codeword) and host transcript work (Shake256 over the
serialized proof stream -> fold challenge alpha).  Every alternation
costs a full tunnel round trip on this hardware (~30 ms), so a 2^20
proof pays ~27 crossings just to move 32-byte roots and alphas back and
forth.  Computing the Fiat-Shamir draw ON the device removes the host
from the loop entirely: the whole cascade becomes one dispatch, and the
host re-derives the identical transcript afterwards from a single
batched fetch of the round roots (reference FS semantics:
proof_stream.rs:50-58; sampling: field.rs:110-116).

Keccak-f[1600] works on 25 64-bit lanes; the TPU has no 64-bit integer
datapath, so a lane is a (lo, hi) pair of uint32 scalars, the state a
(25, 2) uint32 array.  One permutation is a `lax.fori_loop` over the 24
rounds (the per-hash work is tiny and strictly sequential — unrolling
buys nothing and bloats XLA:CPU compile time, the same cliff the
Blake2b kernel hit).  theta/rho/pi/chi are expressed as vectorized ops
over the (5, 5) lane grid with per-lane rotation amounts.

Only what the transcript needs is implemented: absorb a static-length
byte message (multi-block, pad10*1 with the 0x1f SHAKE domain byte) and
squeeze the first 32 bytes.  Bit-identical to hashlib.shake_256 (pinned
in tests/test_device_fs.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_RATE = 136  # SHAKE256 rate in bytes (17 lanes)

# round constants as (lo, hi) uint32 pairs
_RC = np.array(
    [
        [(c & 0xFFFFFFFF), (c >> 32) & 0xFFFFFFFF]
        for c in (
            0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
            0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
            0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
            0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
            0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
            0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
            0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
            0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
        )
    ],
    dtype=np.uint32,
)

# rho rotation amounts, lane index x + 5y
_RHO = np.array(
    [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43,
     25, 39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14],
    dtype=np.uint32,
)

# pi: dst[_PI[i]] = src[i]  =>  dst[j] = src[_PI_INV[j]]
_PI = np.array(
    [0, 10, 20, 5, 15, 16, 1, 11, 21, 6, 7, 17, 2,
     12, 22, 23, 8, 18, 3, 13, 14, 24, 9, 19, 4],
    dtype=np.int32,
)
_PI_INV = np.argsort(_PI).astype(np.int32)


def _rotl64(lo, hi, amount):
    """Vectorized 64-bit rotate-left of (lo, hi) uint32 arrays by per-lane
    ``amount`` (uint32 array, 0 <= amount < 64)."""
    big = amount >= 32
    lo, hi = jnp.where(big, hi, lo), jnp.where(big, lo, hi)
    s = amount % 32
    # jnp shift semantics are undefined at >= bit width: mask s == 0
    t = (32 - s) % 32
    nz = s != 0
    new_lo = jnp.where(nz, (lo << s) | (hi >> t), lo)
    new_hi = jnp.where(nz, (hi << s) | (lo >> t), hi)
    return new_lo, new_hi


def keccak_f1600(state: jnp.ndarray) -> jnp.ndarray:
    """One Keccak-f[1600] permutation over a (25, 2) uint32 state
    (state[i] = (lo, hi) of lane x + 5y)."""
    rc = jnp.asarray(_RC)
    rho = jnp.asarray(_RHO)
    pi_inv = jnp.asarray(_PI_INV)

    def round_body(r, st):
        lo = st[:, 0].reshape(5, 5)  # [y, x]
        hi = st[:, 1].reshape(5, 5)
        # theta
        clo = jnp.bitwise_xor.reduce(lo, axis=0)
        chi_ = jnp.bitwise_xor.reduce(hi, axis=0)
        rlo, rhi = _rotl64(
            jnp.roll(clo, -1), jnp.roll(chi_, -1), jnp.uint32(1)
        )
        dlo = jnp.roll(clo, 1) ^ rlo
        dhi = jnp.roll(chi_, 1) ^ rhi
        lo = lo ^ dlo[None, :]
        hi = hi ^ dhi[None, :]
        # rho + pi
        flo, fhi = _rotl64(lo.reshape(25), hi.reshape(25), rho)
        lo = flo[pi_inv].reshape(5, 5)
        hi = fhi[pi_inv].reshape(5, 5)
        # chi
        lo = lo ^ (~jnp.roll(lo, -1, axis=1) & jnp.roll(lo, -2, axis=1))
        hi = hi ^ (~jnp.roll(hi, -1, axis=1) & jnp.roll(hi, -2, axis=1))
        # iota
        lo = lo.at[0, 0].set(lo[0, 0] ^ rc[r, 0])
        hi = hi.at[0, 0].set(hi[0, 0] ^ rc[r, 1])
        return jnp.stack([lo.reshape(25), hi.reshape(25)], axis=1)

    return jax.lax.fori_loop(0, 24, round_body, state)


def _bytes_to_lanes(block: jnp.ndarray) -> jnp.ndarray:
    """(136,) uint8 -> (17, 2) uint32 little-endian lanes."""
    b = block.astype(jnp.uint32).reshape(17, 8)
    words = (
        b[:, 0::4]
        | (b[:, 1::4] << 8)
        | (b[:, 2::4] << 16)
        | (b[:, 3::4] << 24)
    )  # (17, 2): [:, 0] = lo, [:, 1] = hi
    return words


def shake256_words(msg: jnp.ndarray) -> jnp.ndarray:
    """Shake256 of a (n,) uint8 device array (n static) -> the first 32
    output bytes as a (8,) uint32 little-endian word array."""
    n = int(msg.shape[0])
    nblocks = n // _RATE + 1  # pad10*1 always adds at least one bit
    padded = jnp.zeros(nblocks * _RATE, dtype=jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, msg.astype(jnp.uint8), (0,))
    padded = padded.at[n].set(jnp.uint8(0x1F))
    padded = padded.at[nblocks * _RATE - 1].set(
        padded[nblocks * _RATE - 1] | jnp.uint8(0x80)
    )
    state = jnp.zeros((25, 2), dtype=jnp.uint32)
    for b in range(nblocks):
        lanes = _bytes_to_lanes(padded[b * _RATE : (b + 1) * _RATE])
        state = state.at[:17].set(state[:17] ^ lanes)
        state = keccak_f1600(state)
    out = state[:4]  # first 4 lanes = 32 bytes
    return jnp.stack(
        [out[0, 0], out[0, 1], out[1, 0], out[1, 1],
         out[2, 0], out[2, 1], out[3, 0], out[3, 1]]
    )


def shake256_bytes_host(words: np.ndarray) -> bytes:
    """(8,) uint32 LE words -> the 32 digest bytes (host-side check)."""
    return np.ascontiguousarray(words.astype("<u4")).tobytes()
