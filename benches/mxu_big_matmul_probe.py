"""Big-matmul truth serum: make compute >> every dispatch floor.

The small-shape probes bottomed out at a ~0.17 ms/iteration floor with
time independent of FLOPs, so compute was hidden under dispatch/queue
overhead.  (16384,8192)@(8192,16384) int8 = 4.4e12 ops: ~11 ms at v5e's
394 int8 TOPS, ~2.4 ms at Trillium-class rates — unambiguous either way.
Scratch harness, not a bench.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial

M = 16384
K = 8192


@partial(jax.jit, static_argnames=("acc",))
def step(a, b, t, acc):
    c = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
    )
    m, n = c.shape
    h = (c ^ (c >> 7)).reshape(m, n // K, K).sum(axis=1) if acc == "int32" \
        else jnp.abs(c).reshape(m, n // K, K).sum(axis=1)
    if acc == "int32":
        return ((h + t) & 63).astype(a.dtype)
    return ((h + t) * 1e-6).astype(a.dtype)


def run(in_dtype, acc, iters=5):
    rng = np.random.default_rng(0)
    if acc == "int32":
        a = jnp.asarray(rng.integers(0, 60, (M, K)), dtype=in_dtype)
        b = jnp.asarray(rng.integers(0, 60, (K, M)), dtype=in_dtype)
        tc = jnp.int32
    else:
        a = jnp.asarray(rng.random((M, K)), dtype=in_dtype)
        b = jnp.asarray(rng.random((K, M)), dtype=in_dtype)
        tc = jnp.float32
    x = step(a, b, tc(0), acc)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        x = step(x, b, tc(i), acc)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    flops = 2.0 * M * K * M
    print(f"  {in_dtype:>8}->{acc}: {dt*1e3:8.2f} ms = {flops/dt/1e12:7.1f} Tops/s")


def main():
    print("devices:", jax.devices())
    run("int8", "int32")
    run("bfloat16", "float32")


if __name__ == "__main__":
    main()
