"""Injectable randomness — the determinism seam.

The reference draws proof randomness (trace randomizers, the randomizer
polynomial) from ``thread_rng`` (reference: stark.rs:244-250, :345-352),
making every proof byte-unique.  The TPU framework routes all such draws
through a ``random_bytes(n)`` callable so that:

* production uses OS entropy (default),
* tests use a seeded deterministic stream, enabling byte-exact transcript
  fixtures and reproducible failures,
* recorded randomness from another prover can be replayed for cross-
  verification.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, List

RandomBytes = Callable[[int], bytes]


def os_random_bytes(n: int) -> bytes:
    return os.urandom(n)


def draw_many(rng: RandomBytes, count: int, size: int) -> List[bytes]:
    """``count`` sequential draws of ``size`` bytes from ``rng`` — exactly
    ``[rng(size) for _ in range(count)]``, but routed through the rng's
    batched ``read_many`` when it has one (the randomizer polynomial of a
    large proof draws ~2^17 chunks; per-call hashlib overhead dominates
    otherwise)."""
    many = getattr(rng, "read_many", None)
    if many is not None:
        return many(count, size)
    return [rng(size) for _ in range(count)]


class DeterministicRandom:
    """A Shake256-based deterministic byte stream with a seed."""

    def __init__(self, seed: bytes | str | int = 0) -> None:
        if isinstance(seed, int):
            seed = seed.to_bytes(8, "little")
        elif isinstance(seed, str):
            seed = seed.encode()
        self._seed = seed
        self._counter = 0

    def __call__(self, n: int) -> bytes:
        h = hashlib.shake_256()
        h.update(self._seed)
        h.update(self._counter.to_bytes(8, "little"))
        self._counter += 1
        return h.digest(n)

    def read_many(self, count: int, size: int) -> List[bytes]:
        """Byte-identical to ``count`` sequential calls; batched through
        the native keccak kernel when available (native/keccak.c)."""
        try:
            from .native.hashing_native import batch_shake256_ctr

            raw = batch_shake256_ctr(self._seed, self._counter, count, size)
        except (ImportError, ValueError):
            return [self(size) for _ in range(count)]
        self._counter += count
        return [raw[i * size : (i + 1) * size] for i in range(count)]


class RecordedRandom:
    """Replays a recorded list of byte strings (cross-prover verification)."""

    def __init__(self, chunks) -> None:
        self._chunks = list(chunks)
        self._idx = 0

    def __call__(self, n: int) -> bytes:
        chunk = self._chunks[self._idx]
        self._idx += 1
        if len(chunk) != n:
            raise ValueError(f"recorded chunk has {len(chunk)} bytes, need {n}")
        return chunk
