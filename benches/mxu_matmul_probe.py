"""Does an integer matmul hit the MXU at rate on this chip (via XLA)?

Motivation: the Pallas VPU NTT is 75-81% butterfly-structure overhead
(see ntt_overhead_experiment.py).  A four-step NTT whose small transforms
are TWIDDLE-MATRIX MATMULS over 8-bit digit decompositions would replace
the whole per-stage structure with one MXU contraction:

    limb product  P[d] = sum_{i+j=d} sum_k W_i[K,k] * X_j[k,B]
    == one (16*K, k) x (k, 16*B) integer matmul (digit axes unrolled
       into rows/cols), accumulated exactly in int32
       (max |sum| = 1024 * 255^2 < 2^27), then a Montgomery REDC
       epilogue on the VPU.

This probe times the candidate dtypes at NTT-relevant shapes.  Scratch
harness, not a bench.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("acc", "k"))
def step(a, b, t, acc, k):
    """Matmul + a data-dependent fold of the FULL result back into the
    next LHS.  Two traps this avoids (measured, see git history):
    slicing the result lets XLA shrink the contraction (DCE), and the
    remote tunnel dedupes byte-identical repeat dispatches — so every
    output element must feed the next input, and a distinct scalar t is
    mixed in per iteration."""
    c = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
    )
    m, n = c.shape
    # NON-LINEAR fold before the reduction: sum(a@b) factors into
    # a@sum(b) (the algebraic simplifier shrinks the contraction), but
    # xor/abs cannot be pushed through the dot.
    if acc == "int32":
        h = (c ^ (c >> 7)).reshape(m, n // k, k).sum(axis=1)
        return ((h + t) & 63).astype(a.dtype)
    h = jnp.abs(c).reshape(m, n // k, k).sum(axis=1)
    return ((h + t) * 1e-6).astype(a.dtype)


def timeit(fn, a, iters=10):
    a = fn(a, 0)
    jax.block_until_ready(a)  # compile
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        a = fn(a, i)
    jax.block_until_ready(a)
    return (time.perf_counter() - t0) / iters


def probe(m, k, n, in_dtype, acc, rng):
    if in_dtype in ("int8", "uint8", "int16", "int32"):
        a = jnp.asarray(rng.integers(0, 60, (m, k)), dtype=in_dtype)
        b = jnp.asarray(rng.integers(0, 60, (k, n)), dtype=in_dtype)
        tc = lambda t: jnp.int32(t)
    else:
        a = jnp.asarray(rng.random((m, k)), dtype=in_dtype)
        b = jnp.asarray(rng.random((k, n)), dtype=in_dtype)
        tc = lambda t: jnp.float32(t)
    try:
        dt = timeit(lambda x, t: step(x, b, tc(t), acc, k), a)
    except Exception as e:  # noqa: BLE001
        print(f"  {in_dtype}->{acc}  ({m}x{k})@({k}x{n}): FAILED {type(e).__name__}: {e}")
        return
    flops = 2.0 * m * k * n
    print(
        f"  {in_dtype:>8}->{acc:<8} ({m}x{k})@({k}x{n}): {dt*1e3:8.3f} ms "
        f"= {flops/dt/1e12:7.1f} Tops/s"
    )


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    shapes = [
        (16384, 1024, 16384),  # 2^20 NTT pass: 16 digits x R=1024, B=C=1024*16
        (4096, 4096, 4096),    # square reference
        (4096, 1024, 4096),    # K-scaling sanity: must be ~4x faster than above
    ]
    for (m, k, n) in shapes:
        print(f"shape ({m},{k})@({k},{n}):")
        probe(m, k, n, "int8", "int32", rng)
        probe(m, k, n, "uint8", "int32", rng)
        probe(m, k, n, "int16", "int32", rng)
        probe(m, k, n, "bfloat16", "float32", rng)
        probe(m, k, n, "float32", "float32", rng)


if __name__ == "__main__":
    main()
