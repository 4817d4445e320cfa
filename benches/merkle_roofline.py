"""Pallas Merkle roofline (round-5 brief item 2).

Round 4 landed the Pallas tree at 399 ms / 2^20-leaf tree (~190 ns per
hash) — 2.1x the XLA tree but far from VPU arithmetic peak.  This bench
decomposes the cost the way round 4's NTT experiment did:

1. full tree (the production `tree_levels` path) at 2^20;
2. the leaf kernel and one full-width level kernel in isolation;
3. an XOR-STUB kernel with identical grid/BlockSpecs/IO but a ~free body
   — the launch + VMEM-traffic floor of the kernel shape;
4. a 1-round compress variant — (full - one_round)/11 is the marginal
   cost per Blake2b round, i.e. the instruction-issue rate actually
   achieved, separating "compress arithmetic is the bound" from "the
   between-level glue/dispatch is the bound".

Writes benches/results/merkle_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402

from stark_tpu.ops.pallas_merkle import (  # noqa: E402
    _block_spec,
    _level_kernel,
    _rb_for,
    level_hash_pallas,
    leaf_digests_pallas,
    tree_levels,
)
from stark_tpu.utils.profiling import chain_time  # noqa: E402

T0 = time.time()


def mark(msg):
    print(f"[roofline +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _stub_kernel(e_ref, o_ref, out_ref):
    """Same IO as the level kernel, ~free body: one xor per word."""
    out_ref[...] = jnp.stack(
        [e_ref[i] ^ o_ref[i] for i in range(8)]
    )


def _rounds_kernel(rounds: int):
    """Level kernel with only ``rounds`` Blake2b rounds (NOT a valid
    hash — instruction-rate probe only)."""
    from stark_tpu.ops.device_merkle import _ZERO, blake2b256_single_block

    def kernel(e_ref, o_ref, out_ref):
        left = [e_ref[i] for i in range(8)]
        right = [o_ref[i] for i in range(8)]
        m = [
            (left[0], left[1]), (left[2], left[3]),
            (left[4], left[5]), (left[6], left[7]),
            (right[0], right[1]), (right[2], right[3]),
            (right[4], right[5]), (right[6], right[7]),
        ] + [_ZERO] * 8
        out_ref[...] = jnp.stack(
            list(
                blake2b256_single_block(
                    m, 64, unroll=True, rounds=rounds
                )
            )
        )

    return kernel


def _call_level_variant(kernel, level: jnp.ndarray) -> jnp.ndarray:
    from stark_tpu.ops.pallas_merkle import _word_major

    w = level.shape[1]
    e = _word_major(level[:, 0::2])
    o = _word_major(level[:, 1::2])
    rb = _rb_for(w // 256)
    grid = (w // (2 * 128 * rb),)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, w // 256, 128), jnp.uint32),
        grid=grid,
        in_specs=[_block_spec(8, rb), _block_spec(8, rb)],
        out_specs=_block_spec(8, rb),
    )(e, o)
    return out.reshape(8, -1)


def main():
    logn = int(os.environ.get("STARK_TPU_ROOFLINE_LOGN", "20"))
    n = 1 << logn
    rng = np.random.default_rng(1)
    out = {"n_leaves": n, "backend": jax.default_backend()}

    digits = jnp.asarray(
        rng.integers(0, 1 << 32, (4, n), dtype=np.uint32)
    )
    level = jnp.asarray(
        rng.integers(0, 1 << 32, (8, n), dtype=np.uint32)
    )

    # -- 1. full tree ----------------------------------------------------
    tail = 1024

    @jax.jit
    def full_tree(d):
        levels, root = tree_levels(d, tail)
        return root

    def tree_step(d):
        r = full_tree(d)
        return d.at[0, :8].add(r)  # data dependence for the chain

    info = {}
    dt = chain_time(tree_step, digits, iters=3, details=info)
    n_hashes = 2 * n - 1
    out["tree_s"] = round(dt, 4)
    out["tree_ns_per_hash"] = round(dt / n_hashes * 1e9, 1)
    out["tree_timing"] = info
    mark(f"full tree {dt*1e3:.1f} ms ({dt/n_hashes*1e9:.0f} ns/hash)")

    # -- 2. isolated kernels ----------------------------------------------
    leaf_jit = jax.jit(lambda d: leaf_digests_pallas(d))

    def leaf_step(d):
        r = leaf_jit(d)
        return d.at[:4, :].add(r[:4])

    dt_leaf = chain_time(leaf_step, digits, iters=5)
    out["leaf_kernel_s"] = round(dt_leaf, 4)
    out["leaf_ns_per_hash"] = round(dt_leaf / n * 1e9, 1)
    mark(f"leaf kernel {dt_leaf*1e3:.1f} ms ({dt_leaf/n*1e9:.0f} ns/hash)")

    level_jit = jax.jit(lambda lv: level_hash_pallas(lv))

    def level_step(lv):
        r = level_jit(lv)
        return lv.at[:, : r.shape[1]].add(r)

    dt_level = chain_time(level_step, level, iters=5)
    out["level_kernel_s_at_n"] = round(dt_level, 4)
    out["level_ns_per_hash"] = round(dt_level / (n // 2) * 1e9, 1)
    mark(
        f"level kernel {dt_level*1e3:.1f} ms "
        f"({dt_level/(n//2)*1e9:.0f} ns/hash)"
    )

    # geometric sum of level widths ~= n, so a perfectly-glued tree costs
    # ~leaf + 2x the full-width level kernel (sum w/2 + w/4 + ... = w)
    pred = dt_leaf + 2 * dt_level
    out["kernel_sum_pred_s"] = round(pred, 4)
    out["glue_overhead_s"] = round(dt - pred, 4)
    mark(f"kernel-sum prediction {pred*1e3:.1f} ms; "
         f"glue/dispatch overhead {1e3*(dt-pred):.1f} ms")

    # -- 3. xor stub: launch + IO floor -----------------------------------
    stub_jit = jax.jit(lambda lv: _call_level_variant(_stub_kernel, lv))

    def stub_step(lv):
        r = stub_jit(lv)
        return lv.at[:, : r.shape[1]].add(r)

    dt_stub = chain_time(stub_step, level, iters=5)
    out["stub_kernel_s"] = round(dt_stub, 5)
    out["stub_ns_per_hash"] = round(dt_stub / (n // 2) * 1e9, 1)
    mark(f"xor stub {dt_stub*1e3:.2f} ms ({dt_stub/(n//2)*1e9:.0f} ns/hash)")

    # -- 4. round sweep: marginal cost per Blake2b round -------------------
    sweep = {}
    for rounds in (1, 6, 12):
        k_jit = jax.jit(
            lambda lv, r=rounds: _call_level_variant(_rounds_kernel(r), lv)
        )

        def step(lv, k=k_jit):
            r = k(lv)
            return lv.at[:, : r.shape[1]].add(r)

        sweep[rounds] = chain_time(step, level, iters=5)
        mark(f"rounds={rounds}: {sweep[rounds]*1e3:.2f} ms")
    marginal = (sweep[12] - sweep[1]) / 11
    out["round_sweep_s"] = {str(k): round(v, 5) for k, v in sweep.items()}
    out["marginal_s_per_round"] = round(marginal, 5)
    # speed-of-light for this kernel structure: IO floor + 12 rounds at
    # the measured marginal rate (+ finalization, folded into rounds=1)
    sol = dt_stub + 12 * marginal
    out["kernel_sol_s"] = round(sol, 5)
    out["kernel_vs_sol"] = round(dt_level / sol, 2) if sol else None
    mark(f"marginal {marginal*1e3:.3f} ms/round; "
         f"kernel SoL {sol*1e3:.2f} ms; achieved/SoL "
         f"{dt_level/sol:.2f}x")

    path = os.path.join(_REPO, "benches", "results", "merkle_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
