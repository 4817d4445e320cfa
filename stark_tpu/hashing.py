"""Hash primitives: Blake2b-256/512, Shake256 XOF, batched leaf hashing.

The protocol's hash usage (reference):

* Merkle leaves/nodes: Blake2b with 32-byte digest (merkle.rs:4-10,29)
* FRI index sampling: Blake2b with 64-byte digest (fri.rs:60-65)
* Fiat-Shamir transcript: Shake256 XOF (proof_stream.rs:50-69)
* STARK combination weights: Blake2b-256 (stark.rs:205-220)

Python's hashlib blake2b/shake_256 are exactly these functions (blake2b's
``digest_size`` parameterizes the BLAKE2 parameter block the same way the
Rust `blake2` crate's ``Blake2b<OutputSize>`` does).

For throughput, batched hashing of many equal-role inputs (Merkle leaves and
interior levels) is delegated to the native C library in
:mod:`stark_tpu.native` when it has been built (OpenMP-parallel Blake2b),
with a hashlib fallback so the framework is fully functional without it.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

try:  # optional native acceleration
    from .native import hashing_native as _native
except Exception:  # pragma: no cover - native lib absent
    _native = None


def blake2b_256(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=32).digest()


def blake2b_512(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=64).digest()


def shake256(data: bytes, num_bytes: int) -> bytes:
    return hashlib.shake_256(data).digest(num_bytes)


def blake2b_256_pair(left: bytes, right: bytes) -> bytes:
    h = hashlib.blake2b(digest_size=32)
    h.update(left)
    h.update(right)
    return h.digest()


#: below this many items, ctypes marshalling beats any parallel speedup
_NATIVE_MIN_BATCH = 128


def batch_blake2b_256(items: Sequence[bytes]) -> List[bytes]:
    """Hash many byte strings (Merkle leaf hashing hot loop)."""
    if _native is not None and len(items) >= _NATIVE_MIN_BATCH:
        return _native.batch_blake2b_256(items)
    return [hashlib.blake2b(d, digest_size=32).digest() for d in items]


def merkle_level(nodes: bytes) -> bytes:
    """One interior Merkle level: input is concatenated 32-byte child
    digests (even count); output is the concatenated parent digests."""
    if _native is not None and len(nodes) >= 64 * _NATIVE_MIN_BATCH:
        return _native.merkle_level(nodes)
    out = bytearray()
    for i in range(0, len(nodes), 64):
        out += hashlib.blake2b(nodes[i : i + 64], digest_size=32).digest()
    return bytes(out)


def merkle_levels_from_codeword_digits(digits) -> "list[bytes] | None":
    """Fused native path: (n, 4) uint32 digit rows -> all Merkle levels
    (bincode-serialize + leaf hash + tree build entirely in C).  Returns
    None when the native library is unavailable."""
    if _native is None:
        return None
    leaf = _native.merkle_leaves_u128(digits)
    return _native.merkle_tree_from_leaves(leaf)
