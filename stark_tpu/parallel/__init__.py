"""Multi-chip scaling: mesh construction and domain-sharded NTT/codeword ops.

The reference has no parallelism of any kind (single-threaded Rust; see
SURVEY.md §0.3).  This package is the TPU-native scaling layer designed
from scratch: coefficients/codewords are sharded over a
``jax.sharding.Mesh`` and all cross-chip movement is XLA collectives
(`all_to_all`) over ICI — the TPU-native equivalent of what a GPU framework
would do with NCCL.
"""

from .mesh import make_mesh, cpu_mesh
from .ntt_sharded import ShardedNTT


def __getattr__(name):
    # lazy: stark_sharded pulls in the device-prover stack
    if name in ("ShardedProverCore", "ShardedBackend"):
        from . import stark_sharded

        return getattr(stark_sharded, name)
    raise AttributeError(name)


__all__ = [
    "make_mesh",
    "cpu_mesh",
    "ShardedNTT",
    "ShardedProverCore",
    "ShardedBackend",
]
