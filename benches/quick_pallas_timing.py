"""Quick on-TPU timing for the Pallas NTT after kernel changes.

Not part of the committed bench grid — a scratch harness for iterating
on pallas_ntt.py (run_benches.py / bench.py carry the official numbers).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stark_tpu_jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stark_tpu.params import GENERATOR, P
from stark_tpu.ops.ntt import get_plan
from stark_tpu.ops.pallas_ntt import get_pallas_plan
from stark_tpu.ops.limbs import unpack


def timeit(fn, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def mont_mul_microbench(n_muls=10, logn=20):
    """Time a kernel that is ONLY n_muls chained full-array mont_muls at
    2^logn, to separate raw Montgomery cost from NTT butterfly overhead."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from stark_tpu.ops.pallas_fold import _k_mont_mul
    from stark_tpu.params import NUM_LIMBS

    n = 1 << logn
    r, b = 1024, 128
    c = n // r
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, (8, r, c), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, (r, c), dtype=np.uint32)
    x = jax.numpy.asarray(limbs)
    t = jax.numpy.asarray(
        rng.integers(0, 1 << 16, (8, r, b), dtype=np.uint32)
    )

    def kernel(x_ref, t_ref, o_ref):
        o_ref[...] = x_ref[...]
        for _ in range(n_muls):
            o_ref[...] = _k_mont_mul(o_ref[...], t_ref[...])

    data_spec = pl.BlockSpec(
        (NUM_LIMBS, r, b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    t_spec = pl.BlockSpec(
        (NUM_LIMBS, r, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, r, c), jnp.uint32),
            grid=(c // b,),
            in_specs=[data_spec, t_spec],
            out_specs=data_spec,
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, t)
    )
    jax.block_until_ready(f(x))

    def chained():
        y = x
        for _ in range(5):
            y = f(y)
        jax.block_until_ready(y)

    dt = timeit(chained) / 5
    per_mul = dt / n_muls
    print(
        f"mont_mul microbench 2^{logn}: {n_muls} muls in {dt*1e3:.2f} ms "
        f"-> {per_mul*1e3:.3f} ms/full-array mul "
        f"({n/per_mul/1e6:.0f} M mul/s)"
    )
    return per_mul


def main():
    print("devices:", jax.devices())
    mont_mul_microbench()
    for logn in (20, 22):
        n = 1 << logn
        plan = get_pallas_plan(n)
        rng = np.random.default_rng(0)
        # canonical residues so parity vs XLA is meaningful: random limbs
        # with the top limb < P >> 112 guarantee value < P (P = 1+407*2^119)
        limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
        limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
        a = jax.numpy.asarray(limbs)
        variants = [
            ("forward", lambda x: plan.forward(x)),
            ("coset", lambda x: plan.coset_forward(x, GENERATOR)),
            ("inverse", lambda x: plan.inverse(x)),
        ]
        for name, f in variants:
            t0 = time.perf_counter()
            jax.block_until_ready(f(a))
            compile_s = time.perf_counter() - t0

            def chained():
                x = a
                for _ in range(5):
                    x = f(x)
                jax.block_until_ready(x)

            dt = timeit(chained) / 5
            print(
                f"2^{logn} {name:8s} {dt*1e3:8.2f} ms  "
                f"{n/dt/1e6:7.1f} M coeffs/s  (first call {compile_s:.1f}s)"
            )
        if logn == 20:
            xla = get_plan(n)
            got = np.asarray(jax.block_until_ready(plan.forward(a)))
            ref = np.asarray(jax.block_until_ready(xla.forward(a)))
            ok = unpack(got) == unpack(ref)
            print(f"2^{logn} parity vs XLA (canonical inputs): {ok}")
            assert ok


if __name__ == "__main__":
    main()
