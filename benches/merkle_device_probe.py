"""Device Merkle tree throughput probe (real TPU).

A/B of the Blake2b round schedule (unrolled static-sigma vs fori_loop +
message gather, see ops/device_merkle.blake2b256_single_block) plus a
root-correctness check against the host hashlib tree at 2^14.

Usage: python benches/merkle_device_probe.py [logn ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from stark_tpu.ops import device_merkle as dm  # noqa: E402
from stark_tpu.ops import field_ops as fo  # noqa: E402
from stark_tpu.ops.device_prover import mont_to_digits  # noqa: E402
from stark_tpu.merkle import MerkleTree  # noqa: E402
from stark_tpu.params import P  # noqa: E402
from stark_tpu.utils.profiling import chain_time  # noqa: E402


def probe(logn: int, unroll: bool) -> float:
    import os

    os.environ["STARK_TPU_MERKLE_UNROLL"] = "1" if unroll else "0"
    dm._tree_fn.cache_clear()
    n = 1 << logn
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 62, n)
    from stark_tpu.ops.limbs import pack

    mont = fo.to_mont(jnp.asarray(pack(vals.tolist())))
    fn = dm._tree_fn(n)

    def step(x):
        levels = fn(x)
        tail = levels[-1]
        # fold the tail root words back into the input: data-dependent
        # chaining so repeat dispatches are distinct and un-dedupable
        return x ^ tail[0, 0]

    step_j = jax.jit(step)
    t0 = time.time()
    dt = chain_time(step_j, mont, iters=4)
    print(
        f"  2^{logn} unroll={int(unroll)}: {dt * 1e3:7.1f} ms/tree "
        f"({2 * n / dt / 1e6:6.2f} M hashes/s)  [probe total {time.time() - t0:.0f}s]",
        flush=True,
    )
    return dt


def correctness(logn: int = 14) -> None:
    n = 1 << logn
    rng = np.random.default_rng(1)
    vals = [int(v) % P for v in rng.integers(0, 1 << 63, n)]
    from stark_tpu.ops.limbs import pack

    mont = fo.to_mont(jnp.asarray(pack(vals)))
    want = MerkleTree.from_digits(
        np.ascontiguousarray(mont_to_digits(mont))
    ).root
    import os

    for flag in ("1", "0"):
        os.environ["STARK_TPU_MERKLE_UNROLL"] = flag
        dm._tree_fn.cache_clear()
        got = dm.DeviceMerkleTree(mont).root
        assert got == want, f"device root mismatch (unroll={flag})"
    print(f"  2^{logn} device roots (both schedules) == host hashlib root",
          flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [18, 20]
    print("correctness:", flush=True)
    correctness()
    print("throughput:", flush=True)
    for logn in sizes:
        probe(logn, unroll=True)
        probe(logn, unroll=False)


if __name__ == "__main__":
    main()
