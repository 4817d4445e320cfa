"""Native (C++) host acceleration: batched Blake2b hashing and Merkle levels.

Built from ``native/`` at the repo root via ``make -C native`` (see
native/README.md); loaded through ctypes.  All functionality has pure-Python
fallbacks in :mod:`stark_tpu.hashing` — the native path is a performance
feature, not a correctness dependency.
"""
