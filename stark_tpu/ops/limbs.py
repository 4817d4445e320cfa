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


def pack_scalar(value: int) -> np.ndarray:
    """One residue -> uint32 (8, 1)."""
    return pack([value])


def limbs_of(value: int) -> List[int]:
    """Static little-endian 16-bit limbs of a Python int (for constants)."""
    return [(int(value) >> (LIMB_BITS * l)) & LIMB_MASK for l in range(NUM_LIMBS)]
