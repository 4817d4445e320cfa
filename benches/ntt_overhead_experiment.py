"""How much of the Pallas NTT is NOT Montgomery multiplies?

Runs the production four-step forward at 2^20 and 2^22, then a clone with
every mont_mul replaced by XOR (same data movement, butterflies, carry
chains in add/sub — just no multiply pipeline). The gap bounds what
multiply-side optimizations could ever win; the xor floor bounds what
stage-fusion / relayout work could win.  Scratch harness, not a bench.

A first run under the block_until_ready protocol suggested 75-81%
non-multiply time — but that protocol was then shown to under-measure
compute (utils.profiling.chain_time documents the traps), so this
harness now times fetch-bracketed chains.  Honest results live in
BENCHMARKS.md.
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

    from stark_tpu.utils.profiling import chain_time

    with ExitStack() as ctx_stack:
        for p_ in patches:
            ctx_stack.enter_context(p_)
        plan = pntt.PallasNTT(n)  # fresh plan: no lru cache pollution
        dt = chain_time(plan.forward, a, iters=10)
    tag = "xor-all" if stub_addsub else ("xor-stub" if stub_muls else "real")
    print(
        f"2^{logn} forward [{tag:8s}] {dt*1e3:7.2f} ms "
        f"({n/dt/1e6:6.1f} M coeffs/s)"
    )
    return dt


def main():
    print("devices:", jax.devices())
    for logn in (20, 22):
        real = run(logn, stub_muls=False)
        stub = run(logn, stub_muls=True)
        bare = run(logn, stub_muls=True, stub_addsub=True)
        print(
            f"2^{logn}: non-mul = {stub*1e3:.2f} ms ({100*stub/real:.0f}%), "
            f"pure relayout = {bare*1e3:.2f} ms ({100*bare/real:.0f}%)"
        )


if __name__ == "__main__":
    main()
