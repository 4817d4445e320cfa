"""Where do the 13.5 s/tree Merkle commits go at 2^20?

Splits the device-prover commit path into: device compute sync, the
(4, n) uint32 digit fetch over the tunnel, native C leaf hashing, and
native C tree build.  Scratch harness.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stark_tpu.hashing import merkle_levels_from_codeword_digits
from stark_tpu.ops.device_prover import _plain_digits
from stark_tpu.params import P


def main():
    print("devices:", jax.devices())
    n = 1 << 20
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
    mont = jnp.asarray(limbs)

    # warm the digit kernel
    d = _plain_digits(mont)
    _ = int(jax.device_get(jnp.max(d[..., :1])))

    for trial in range(3):
        t0 = time.perf_counter()
        d = _plain_digits(mont)
        scalar = int(jax.device_get(jnp.max(d[..., :1])))
        t_compute = time.perf_counter() - t0

        t1 = time.perf_counter()
        host = np.asarray(jax.device_get(d))
        t_fetch = time.perf_counter() - t1

        digits = host.T if host.shape[0] == 4 else host
        digits = np.ascontiguousarray(digits)
        t2 = time.perf_counter()
        levels = merkle_levels_from_codeword_digits(digits)
        t_hash = time.perf_counter() - t2
        assert levels is not None
        print(
            f"trial {trial}: digit-kernel+sync {t_compute*1e3:8.1f} ms, "
            f"fetch 16MB {t_fetch*1e3:8.1f} ms "
            f"({16 / max(t_fetch, 1e-9):.1f} MB/s), "
            f"native hash+tree {t_hash*1e3:8.1f} ms (scalar {scalar})"
        )


if __name__ == "__main__":
    main()
