"""13-bit lazy-carry Montgomery multiply: the measured experiment behind
the round-5 NTT op-count analysis (BENCHMARKS.md).

The production multiply uses 8x16-bit limbs: every 26/32-bit partial
product must be split (mask + shift + 2 adds) IMMEDIATELY because a
second unsplit partial would overflow the u32 column.  With 13-bit
limbs (10 limbs, R' = 2^130) a partial is < 2^26, leaving 6 bits of
column headroom — all 10 CIOS iterations accumulate WITHOUT per-partial
splits, and one carry sweep at the end suffices.  Bonus: in base 2^13
this prime is even sparser than in base 2^16 —

    p = 1 + 407*2^119 = 1 + 1628*2^(13*9)   (limbs {0: 1, 9: 1628})

so the m*p step is ONE extra product per iteration, like the 16-bit
path.  Net op count ~355 vs ~475 vector ops per multiply (counted in
BENCHMARKS.md); this harness measures what that is actually worth on
hardware, chained inside a Pallas kernel exactly like
benches/mont_mul_experiments.py measures the production multiply.

NOTE: this computes a*b*2^-130 mod p (R' = 2^130), NOT the production
a*b*2^-128 — a full adoption would re-derive every Montgomery constant.
Pure measurement; correctness of the arithmetic is asserted against
Python ints before timing.
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
from stark_tpu.params import P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 13
L = 10  # 130 bits >= 128
MASK = (1 << W) - 1
P_LIMB9 = (P - 1) >> (W * 9)  # 1628
assert P == 1 + (P_LIMB9 << (W * 9))
N_MULS = 10


def pack13(values):
    """ints -> (10, N) uint32 arrays of 13-bit limbs."""
    out = np.zeros((L, len(values)), np.uint32)
    for i, v in enumerate(values):
        for l in range(L):
            out[l, i] = (v >> (W * l)) & MASK
    return out


def unpack13(arr):
    arr = np.asarray(arr)
    return [
        sum(int(arr[l, i]) << (W * l) for l in range(L))
        for i in range(arr.shape[1])
    ]


def mont_mul13(a, b):
    """CIOS with lazy 26-bit accumulation: zero per-partial splits.
    Computes a*b*2^-130 mod p on (10, ...) canonical 13-bit limb arrays."""
    az = [a[i] for i in range(L)]
    t = [jnp.zeros_like(az[0]) for _ in range(L + 1)]
    for i in range(L):
        bi = b[i]
        # accumulate FULL 26-bit products — no mask/shift/split
        for j in range(L):
            t[j] = t[j] + az[j] * bi
        m = (0 - t[0]) & MASK  # p == 1 (mod 2^13)
        t[0] = t[0] + m  # m*p limb 0
        t[9] = t[9] + m * P_LIMB9  # m*p limb 9 — p's ONLY other limb
        # shift one limb right; t[0] == 0 (mod 2^13), fold its carry
        carry = t[0] >> W
        t = t[1:] + [jnp.zeros_like(t[0])]
        t[0] = t[0] + carry
    # single carry sweep to 13-bit limbs
    out = []
    carry = jnp.zeros_like(t[0])
    for limb in t:
        s = limb + carry
        out.append(s & MASK)
        carry = s >> W
    out.append(carry)
    # conditional subtract p (result < 2p): p = {0: 1, 9: P_LIMB9}
    p_limbs = [1] + [0] * 8 + [P_LIMB9] + [0] * (len(out) - L)
    diff = []
    borrow = jnp.zeros_like(out[0])
    for i, limb in enumerate(out):
        need = p_limbs[i] + borrow
        bb = (limb < need).astype(jnp.uint32)
        diff.append((limb - need) & MASK)
        borrow = bb
    keep = borrow == 0
    return jnp.stack(
        [jnp.where(keep, d, o) for d, o in zip(diff[:L], out[:L])]
    )


def correctness():
    rng = np.random.default_rng(5)
    vals_a = [int(x) % P for x in rng.integers(0, 1 << 63, 64)]
    vals_a = [pow(v, 3, P) for v in vals_a]  # spread over the field
    vals_b = [pow(v + 1, 5, P) for v in vals_a]
    a = jnp.asarray(pack13(vals_a))
    b = jnp.asarray(pack13(vals_b))
    got = unpack13(mont_mul13(a, b))
    rinv = pow(1 << (W * L), -1, P)
    want = [x * y * rinv % P for x, y in zip(vals_a, vals_b)]
    assert got == want, "mont_mul13 arithmetic mismatch"
    print("mont_mul13 correctness: 64/64 exact (a*b*2^-130 mod p)")


def run_kernel(logn=20):
    n = 1 << logn
    r, blk = 1024, 128
    c = n // r
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << W, (L, r, c), dtype=np.uint32)
    limbs[9] = rng.integers(0, P >> (W * 9), (r, c), dtype=np.uint32)
    x = jnp.asarray(limbs)
    t = jnp.asarray(rng.integers(0, 1 << W, (L, r, blk), dtype=np.uint32))

    def kernel(x_ref, t_ref, o_ref):
        o_ref[...] = x_ref[...]
        for _ in range(N_MULS):
            o_ref[...] = mont_mul13(o_ref[...], t_ref[...])

    data_spec = pl.BlockSpec(
        (L, r, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    t_spec = pl.BlockSpec(
        (L, r, blk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, r, c), jnp.uint32),
            grid=(c // blk,),
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

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chained()
        best = min(best, time.perf_counter() - t0)
    dt = best / 5 / N_MULS
    print(
        f"lazy13   {dt*1e3:7.3f} ms/full-array mul at 2^{logn} "
        f"({n/dt/1e6:6.0f} M mul/s, first call {compile_s:.1f}s)"
    )
    return dt


def main():
    correctness()
    print("devices:", jax.devices())
    run_kernel()
    print(
        "compare against `python benches/mont_mul_experiments.py` "
        "base mode (8x16-bit production multiply, same harness shape)"
    )


if __name__ == "__main__":
    main()
