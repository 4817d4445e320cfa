"""Honest Pallas-vs-XLA NTT crossover + Pallas-vs-XLA fold decision.

The round-1 crossover (PALLAS_NTT_MIN_SIZE = 2^18) and the fold-kernel
choice (XLA fold_mont over fold_mont_pallas) were both set from
block_until_ready timings that under-measured compute (benches/timing.py).
Re-decide both with fetch-bracketed chains.  Scratch harness.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stark_tpu.params import P, GENERATOR
from stark_tpu.utils.profiling import chain_time


def data(n, rng):
    limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
    return jnp.asarray(limbs)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    from stark_tpu.ops.ntt import get_plan
    from stark_tpu.ops.pallas_ntt import get_pallas_plan

    for logn in (14, 16, 18):
        n = 1 << logn
        a = data(n, rng)
        x = jax.jit(get_plan(n).forward)
        dt_x = chain_time(x, a, iters=10)
        try:
            p = get_pallas_plan(n)
            dt_p = chain_time(p.forward, a, iters=10)
        except Exception as e:  # noqa: BLE001
            dt_p = float("nan")
            print(f"  pallas 2^{logn} failed: {e}")
        print(
            f"2^{logn}: xla {dt_x*1e3:7.3f} ms   pallas {dt_p*1e3:7.3f} ms"
        )

    # fold: XLA vs Pallas kernel at 2^18/2^20
    from stark_tpu.field import FieldElement
    from stark_tpu.ops.fold import _fold_tables, fold_mont
    from stark_tpu.ops.pallas_fold import fold_mont_pallas

    for logn in (18, 20):
        n = 1 << logn
        cw = data(n, rng)
        alpha = jnp.asarray(rng.integers(0, 1 << 16, (8, 1), dtype=np.uint32))
        omega = FieldElement.primitive_nth_root(n).value
        tab = jnp.asarray(_fold_tables(GENERATOR, omega, n // 2))

        @jax.jit
        def step_x(x, tab=tab, alpha=alpha):
            y = fold_mont(x, alpha, tab)
            return jnp.concatenate([y, y], axis=1)

        @jax.jit
        def step_p(x, tab=tab, alpha=alpha):
            y = fold_mont_pallas(x, alpha, tab)
            return jnp.concatenate([y, y], axis=1)

        dt_x = chain_time(step_x, cw, iters=10)
        dt_p = chain_time(step_p, cw, iters=10)
        print(
            f"fold 2^{logn}: xla {dt_x*1e3:7.3f} ms   pallas {dt_p*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
