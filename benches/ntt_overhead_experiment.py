"""How much of the Pallas NTT is NOT Montgomery multiplies?

Runs the production four-step forward at 2^20 and 2^22, then a clone with
every mont_mul replaced by XOR (same data movement, butterflies, carry
chains in add/sub — just no multiply pipeline). The gap bounds what
multiply-side optimizations could ever win; the xor floor bounds what
stage-fusion / relayout work could win.  Scratch harness, not a bench.

Measured (v5e, 2026-08-17, after the identity-skip change):

    2^20 forward [real    ]    8.90 ms ( 117.8 M coeffs/s)
    2^20 forward [xor-stub]    6.71 ms ( 156.3 M coeffs/s)  -> 75% non-mul
    2^22 forward [real    ]   22.25 ms ( 188.5 M coeffs/s)
    2^22 forward [xor-stub]   17.98 ms ( 233.3 M coeffs/s)  -> 81% non-mul

Conclusion: the kernel is dominated by the butterfly structure itself
(add/sub carry+canonicalize chains and the per-stage sublane relayouts),
not by Montgomery multiplies.  Shaving the multiply further is capped at
~20-25%; the real lever is eliminating the per-stage structure entirely
(e.g. small-NTT-as-matmul on the MXU with digit accumulation).
"""
import os
import sys
import time
from unittest import mock

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stark_tpu_jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stark_tpu.params import P


def timeit(fn, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _xor_mul(a, b):
    return a ^ b


def run(logn, stub_muls, stub_addsub=False):
    import stark_tpu.ops.pallas_ntt as pntt

    n = 1 << logn
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, (8, n), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, n, dtype=np.uint32)
    a = jnp.asarray(limbs)

    patches = []
    if stub_muls:
        patches.append(mock.patch.object(pntt, "_k_mont_mul", _xor_mul))
    if stub_addsub:
        patches.append(mock.patch.object(pntt, "_k_add", _xor_mul))
        patches.append(mock.patch.object(pntt, "_k_sub", _xor_mul))
    from contextlib import ExitStack

    with ExitStack() as ctx_stack:
        for p_ in patches:
            ctx_stack.enter_context(p_)
        plan = pntt.PallasNTT(n)  # fresh plan: no lru cache pollution
        f = plan.forward
        t0 = time.perf_counter()
        jax.block_until_ready(f(a))
        compile_s = time.perf_counter() - t0

        def chained():
            x = a
            for _ in range(5):
                x = f(x)
            jax.block_until_ready(x)

        dt = timeit(chained) / 5
    tag = "xor-stub" if stub_muls else "real"
    print(
        f"2^{logn} forward [{tag:8s}] {dt*1e3:7.2f} ms "
        f"({n/dt/1e6:6.1f} M coeffs/s, first call {compile_s:.1f}s)"
    )
    return dt


def main():
    print("devices:", jax.devices())
    for logn in (20, 22):
        real = run(logn, stub_muls=False)
        stub = run(logn, stub_muls=True)
        print(
            f"2^{logn}: non-mul overhead = {stub*1e3:.2f} ms "
            f"({100*stub/real:.0f}% of total)"
        )


if __name__ == "__main__":
    main()
