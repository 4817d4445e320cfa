"""Host <-> device conversion for the limb representation.

A batch of field elements is a ``uint32`` array of shape ``(8, N)`` (or
``(8, *batch)``), limb-major and little-endian: lane ``[l, i]`` holds bits
``[16*l, 16*l+16)`` of element ``i``.  Limb-major layout keeps the batch
dimension on the TPU's 128-wide vector lanes, so every limb operation is a
full-width VPU op; the tiny limb axis (8) is unrolled in the kernels.

TPUs have no 64-bit integer datapath — 16-bit limbs make every partial
product (< 2^32) exact in a uint32 lane, and carry accumulation has ~11
bits of slack before propagation is required (see
:mod:`stark_tpu.ops.field_ops`).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, P


def pack(values: Sequence[int]) -> np.ndarray:
    """Python ints (canonical residues) -> uint32 array of shape (8, N)."""
    n = len(values)
    buf = bytearray(16 * n)
    for i, v in enumerate(values):
        buf[16 * i : 16 * i + 16] = int(v % P).to_bytes(16, "little")
    u16 = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, NUM_LIMBS)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def unpack(arr) -> List[int]:
    """uint32 (8, N) limb array -> list of Python ints.

    Vectorized through a little-endian byte buffer: one numpy transpose +
    one int.from_bytes per element (the per-limb Python loop this
    replaced dominated host<->device conversion at large sizes)."""
    a = np.asarray(arr, dtype=np.uint32)
    if a.ndim == 1:
        a = a[:, None]
    n = a.shape[-1]
    u16 = np.ascontiguousarray((a & LIMB_MASK).T.astype("<u2"))  # (N, 8)
    buf = u16.tobytes()
    return [
        int.from_bytes(buf[16 * i : 16 * i + 16], "little") for i in range(n)
    ]


_B0_TABLE = None


def _b0_table() -> np.ndarray:
    """(256, 4) uint64 digit rows of ``b << 128 mod p`` for each byte b."""
    global _B0_TABLE
    if _B0_TABLE is None:
        from ..params import P

        tab = np.empty((256, 4), np.uint64)
        for b in range(256):
            v = (b << 128) % P
            for i in range(4):
                tab[b, i] = (v >> (32 * i)) & 0xFFFFFFFF
        _B0_TABLE = tab
    return _B0_TABLE


def pack_be17(raw: bytes) -> np.ndarray:
    """Concatenated 17-byte big-endian chunks -> (8, N) uint32 limb array
    of ``int.from_bytes(chunk, "big") % P`` per chunk, fully vectorized
    (the randomizer polynomial draws ~2^17 such chunks per large proof;
    the Python-int parse/reduce/pack loops cost ~1 us per element).

    Reduction: v = b0 * 2^128 + v0 with b0 the leading byte.  v0 < 2^128
    < 2p needs one conditional subtraction, and b0 * 2^128 mod p is the
    Montgomery form of b0 (one vectorized mont-mul by R^2); their mod-p
    sum is the canonical residue.  Bit-identical to the int path (pinned
    by tests)."""
    from .. import hostops as ho

    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 17)
    n = a.shape[0]
    b0 = a[:, 0]
    le = np.ascontiguousarray(a[:, 1:][:, ::-1])  # v0, little-endian bytes
    d = le.view("<u4")  # (N, 4) 32-bit digits
    v0 = np.ascontiguousarray(d.T).astype(np.uint64)  # (4, N)
    t = np.concatenate([v0, np.zeros((1, n), np.uint64)], axis=0)
    v0c = ho._canonicalize(t)
    # b0 * 2^128 mod p: b0 is one BYTE, so a 256-entry digit table beats
    # a vectorized Montgomery multiply (the mul was ~40% of this
    # function at flagship sizes — round-5 attribution)
    term = np.ascontiguousarray(_b0_table()[b0].T)  # (4, N)
    out32 = ho.add(v0c, term)  # canonical (4, N) 32-bit digit rows
    out = np.empty((8, n), np.uint32)
    out[0::2] = (out32 & np.uint64(0xFFFF)).astype(np.uint32)
    out[1::2] = (out32 >> np.uint64(16)).astype(np.uint32)
    return out


def pack_scalar(value: int) -> np.ndarray:
    """One residue -> uint32 (8, 1)."""
    return pack([value])


def limbs_of(value: int) -> List[int]:
    """Static little-endian 16-bit limbs of a Python int (for constants)."""
    return [(int(value) >> (LIMB_BITS * l)) & LIMB_MASK for l in range(NUM_LIMBS)]
