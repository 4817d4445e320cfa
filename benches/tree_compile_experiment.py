"""Compile-time vs runtime tradeoff for the device Merkle tree.

The unrolled Blake2b compress makes the 2^20 tree module ~150k HLO ops
(~11.6 MB StableHLO): minutes to compile and an ~80 MB serialized
executable that costs minutes to LOAD through the remote tunnel.  The
rolled variant (lax.fori_loop over the 12 rounds, message words gathered
through the SIGMA table) exists for XLA:CPU; this experiment measures
both on the real TPU:

    STARK_TPU_MERKLE_UNROLL={0,1} python benches/tree_compile_experiment.py

Prints compile seconds, serialized size, and chained runtime.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# throwaway cache: we want the true compile cost
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

import jax.numpy as jnp
import numpy as np

LOGN = int(os.environ.get("STARK_TPU_TREE_LOGN", "20"))


def main():
    from stark_tpu.ops.device_merkle import tree_arrays_with_root

    n = 1 << LOGN
    rng = np.random.default_rng(0)
    mont = jnp.asarray(rng.integers(0, 1 << 16, (8, n), dtype=np.uint32))

    def step(m):
        levels, root = tree_arrays_with_root(m, n)
        return m ^ root[:, None]  # data-dependent chain input

    fn = jax.jit(step)
    t0 = time.time()
    lowered = fn.lower(mont)
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        size = len(compiled.runtime_executable().serialize())
    except Exception:
        size = -1

    # warm chain timing (data-dependent, closed by a host fetch)
    out = compiled(mont)
    jax.block_until_ready(out)
    iters = 8
    t0 = time.time()
    cur = mont
    for _ in range(iters):
        cur = compiled(cur)
    _ = np.asarray(jax.device_get(cur[:, :1]))
    chain_s = (time.time() - t0) / iters

    unroll = os.environ.get("STARK_TPU_MERKLE_UNROLL", "default")
    print(
        f"unroll={unroll} n=2^{LOGN}: trace {trace_s:.1f}s, "
        f"compile {compile_s:.1f}s, serialized {size/1e6:.1f} MB, "
        f"tree chain {chain_s*1e3:.1f} ms/iter",
        flush=True,
    )


if __name__ == "__main__":
    main()
