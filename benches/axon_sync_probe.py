"""Does block_until_ready actually wait on the axon remote backend?

Chain 5 big int8 matmuls, time (a) block_until_ready, then (b) pulling
one scalar derived from the result to the host.  If (b) dwarfs (a), the
"ready" signal fires before the compute finishes and every sub-second
timing taken via block_until_ready on this machine must be re-examined.
Also checks matmul numerics against numpy on a small tile.
Scratch harness, not a bench.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

M = 16384
K = 8192


@jax.jit
def step(a, b, t):
    c = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    m, n = c.shape
    h = (c ^ (c >> 7)).reshape(m, n // K, K).sum(axis=1)
    return ((h + t) & 63).astype(jnp.int8)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 60, (M, K)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(0, 60, (K, M)), dtype=jnp.int8)

    # numerics sanity on a small tile
    sa = np.asarray(a[:64, :]).astype(np.int64)
    sb = np.asarray(b[:, :64]).astype(np.int64)
    want = sa @ sb
    got = np.asarray(
        jax.device_get(
            jax.lax.dot_general(
                a[:64], b[:, :64], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
    )
    print("numerics ok:", np.array_equal(want, got))

    x = step(a, b, jnp.int32(0))
    jax.block_until_ready(x)
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(1, 6):
            x = step(x, b, jnp.int32(100 * trial + i))
        jax.block_until_ready(x)
        t_ready = time.perf_counter() - t0
        t1 = time.perf_counter()
        val = int(jax.device_get(x[0, 0]))
        t_get = time.perf_counter() - t1
        print(
            f"trial {trial}: block_until_ready {t_ready*1e3:8.2f} ms, "
            f"then device_get {t_get*1e3:8.2f} ms (val {val})"
        )


if __name__ == "__main__":
    main()
