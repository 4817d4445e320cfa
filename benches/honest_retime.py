"""Re-measure the headline device kernels with fetch-bracketed timing.

block_until_ready on the axon tunnel can return before compute finishes
(benches/timing.py), so every prior chained-block timing needs
re-validation.  Prints old-claim vs honest numbers.
Scratch harness; bench.py carries the canonical protocol.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from timing import chain_time

from stark_tpu.params import P


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    from stark_tpu.ops.pallas_ntt import get_pallas_plan
    from stark_tpu.ops.ntt import get_plan

    for logn, old_ms in ((20, 8.9), (22, 22.25)):
        n = 1 << logn
        limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
        limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
        a = jnp.asarray(limbs)
        plan = get_pallas_plan(n)
        dt = chain_time(plan.forward, a, iters=10)
        print(
            f"pallas fwd 2^{logn}: honest {dt*1e3:7.2f} ms "
            f"({n/dt/1e6:6.1f} M/s)  [old claim {old_ms} ms]"
        )

    n = 1 << 20
    limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
    a = jnp.asarray(limbs)
    xplan = get_plan(n)
    xfwd = jax.jit(xplan.forward)
    dt = chain_time(xfwd, a, iters=5)
    print(f"xla fwd 2^20:    honest {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M/s)  [old claim 22.6 ms]")

    # FRI fold (not shape preserving: duplicate the half back up; the
    # extra concat makes this an upper bound)
    from stark_tpu.field import FieldElement
    from stark_tpu.ops.fold import _fold_tables, fold_mont
    from stark_tpu.params import GENERATOR

    cw = jnp.asarray(rng.integers(0, 1 << 16, (8, n), dtype=np.uint32))
    alpha = jnp.asarray(rng.integers(0, 1 << 16, (8, 1), dtype=np.uint32))
    omega = FieldElement.primitive_nth_root(n).value
    tab = jnp.asarray(_fold_tables(GENERATOR, omega, n // 2))

    @jax.jit
    def fold_step(x):
        y = fold_mont(x, alpha, tab)
        return jnp.concatenate([y, y], axis=1)

    dt = chain_time(fold_step, cw, iters=10)
    print(f"fold 2^20:       honest {dt*1e3:7.2f} ms ({n/dt/1e6:6.1f} M elems/s upper-bound incl concat)  [old claim 151M/s]")

    # Rescue permutation, batch 4096
    from stark_tpu.ops import rescue as rescue_ops

    state = jnp.asarray(rng.integers(0, 1 << 16, (8, 2, 4096), dtype=np.uint32))
    dt = chain_time(rescue_ops.permutation_mont, state, iters=5)
    print(f"rescue batch4096: honest {dt*1e3:7.2f} ms ({4096/dt:,.0f} hashes/s)  [old claim 149-157k/s]")


if __name__ == "__main__":
    main()
