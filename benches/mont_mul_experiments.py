"""Microbenchmarks isolating the cost structure of the Pallas Montgomery
multiply (scratch harness for kernel iteration, not part of the bench grid).

Variants, each a kernel of N chained "multiplies" on (8, 1024, 128) blocks
over a 2^20 array:

  base   — the production _k_mont_mul
  hint16 — same, but every 32x32 product's operands are first masked with
           & 0xFFFF (semantically a no-op: all limbs are < 2^16) to let
           Mosaic's range analysis prove a 16x16 multiply suffices
  xor    — products replaced by XOR: the floor set by the non-multiply ops
           (adds/masks/shifts/carries); the base-minus-xor gap is what the
           u32 multiplies themselves cost
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stark_tpu_jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stark_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stark_tpu.params import NUM_LIMBS, P, P_TOP, LIMB_BITS, LIMB_MASK

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKI = LIMB_MASK
N_MULS = 10


def _mont_mul_variant(a, b, mode):
    az = [a[i] for i in range(NUM_LIMBS)]
    t = [jnp.zeros_like(az[0]) for _ in range(NUM_LIMBS + 1)]
    for i in range(NUM_LIMBS):
        bi = b[i]
        for j in range(NUM_LIMBS):
            if mode == "xor":
                prod = az[j] ^ bi
            elif mode == "hint16":
                prod = (az[j] & _MASKI) * (bi & _MASKI)
            else:
                prod = az[j] * bi
            t[j] = t[j] + (prod & _MASKI)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = (0 - t[0]) & _MASKI
        t0 = t[0] + m
        if mode == "xor":
            mp = m ^ P_TOP
        elif mode == "hint16":
            mp = (m & _MASKI) * P_TOP
        else:
            mp = m * P_TOP
        t[NUM_LIMBS - 1] = t[NUM_LIMBS - 1] + (mp & _MASKI)
        t[NUM_LIMBS] = t[NUM_LIMBS] + (mp >> LIMB_BITS)
        carry = t0 >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t0)]
        t[0] = t[0] + carry
    out = []
    carry = jnp.zeros_like(t[0])
    for limb in t[: NUM_LIMBS + 1]:
        s = limb + carry
        out.append(s & _MASKI)
        carry = s >> LIMB_BITS
    t = out
    p_limbs = [1] + [0] * 6 + [P_TOP, 0]
    diff = []
    borrow = jnp.zeros_like(t[0])
    for i in range(NUM_LIMBS + 1):
        need = p_limbs[i] + borrow
        b_ = (t[i] < need).astype(jnp.uint32)
        diff.append((t[i] - need) & _MASKI)
        borrow = b_
    keep_diff = borrow == 0
    return jnp.stack(
        [jnp.where(keep_diff, d, o) for d, o in zip(diff[:NUM_LIMBS], t[:NUM_LIMBS])]
    )


def timeit(fn, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_variant(mode, logn=20):
    n = 1 << logn
    r, b = 1024, 128
    c = n // r
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, (8, r, c), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, (r, c), dtype=np.uint32)
    x = jnp.asarray(limbs)
    t = jnp.asarray(rng.integers(0, 1 << 16, (8, r, b), dtype=np.uint32))

    def kernel(x_ref, t_ref, o_ref):
        o_ref[...] = x_ref[...]
        for _ in range(N_MULS):
            o_ref[...] = _mont_mul_variant(o_ref[...], t_ref[...], mode)

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
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    compile_s = time.perf_counter() - t0

    def chained():
        y = x
        for _ in range(5):
            y = f(y)
        jax.block_until_ready(y)

    dt = timeit(chained) / 5 / N_MULS
    print(
        f"{mode:8s} {dt*1e3:7.3f} ms/full-array mul at 2^{logn} "
        f"({n/dt/1e6:6.0f} M mul/s, first call {compile_s:.1f}s)"
    )
    return dt


def main():
    print("devices:", jax.devices())
    for mode in ("base", "hint16", "xor"):
        run_variant(mode)

    # correctness of hint16 vs base on canonical inputs (tiny, interpret)
    rng = np.random.default_rng(3)
    limbs = rng.integers(0, 1 << 16, (8, 8, 128), dtype=np.uint32)
    limbs[7] = rng.integers(0, P >> 112, (8, 128), dtype=np.uint32)
    a = jnp.asarray(limbs)
    t16 = rng.integers(0, 1 << 16, (8, 8, 128), dtype=np.uint32)
    t16[7] = rng.integers(0, P >> 112, (8, 128), dtype=np.uint32)
    b = jnp.asarray(t16)
    base = _mont_mul_variant(a, b, "base")
    hint = _mont_mul_variant(a, b, "hint16")
    same = bool(jnp.array_equal(base, hint))
    print("hint16 == base:", same)
    assert same


if __name__ == "__main__":
    main()
