"""Lowered-module size census for the flagship device modules.

Compile time through the remote-compile tunnel tracks module size; this
probe lowers (traces, no compile) each module a fib-2^16 / chain-4096
prove needs and prints the StableHLO text size as a diet target list.

Usage: python benches/module_sizes.py [--chain]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.ops.precompile import stark_precompile_jobs


def lowered_size(name, fn, *args):
    try:
        low = jax.jit(fn).lower(*args)
        txt = low.as_text()
        print(f"{name:24s} {len(txt)/1e6:8.2f} MB stablehlo")
        return len(txt)
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s} FAILED: {str(e)[:120]}")
        return 0


def main():
    from stark_tpu.models.fibonacci import FibonacciStark
    from stark_tpu.ops.backend import JaxBackend
    from stark_tpu.rng import DeterministicRandom

    model = FibonacciStark(
        1 << 16, backend=JaxBackend(), rng=DeterministicRandom(7)
    )
    stark = model.stark
    core = stark._device_core()
    n = stark.fri_domain_length
    m_trace = model.air.trace_length + stark.num_randomizers
    full = (8, n)
    z = lambda shape: jnp.zeros(shape, jnp.uint32)  # noqa: E731

    total = 0
    # interp
    from stark_tpu.ops.geometric_device import (
        _interpolate_body, product_tabs,
    )

    chirp_tabs = product_tabs(m_trace + (2 * m_trace - 1) - 1)
    comb_tabs = product_tabs((m_trace + 1) + m_trace - 1)
    total += lowered_size(
        "interp",
        lambda ys, t1, t2: _interpolate_body(
            ys, 1, stark.omicron.value, t1, t2
        ),
        z((8, m_trace)), chirp_tabs, comb_tabs,
    )

    # tree
    from stark_tpu.ops.device_merkle import tree_arrays_with_root

    total += lowered_size(
        "tree", lambda m: tree_arrays_with_root(m, n), z(full)
    )

    # one cascade round at full size
    from stark_tpu.ops.device_fs import alpha_mont_from_fs, hex_words
    from stark_tpu.ops.device_keccak import shake256_words
    from stark_tpu.ops.fold import fold_mont

    body_len = 72 * 3
    count_arr = jnp.asarray(
        np.frombuffer((4).to_bytes(8, "little"), dtype=np.uint8)
    )
    len64_arr = jnp.asarray(
        np.frombuffer((64).to_bytes(8, "little"), dtype=np.uint8)
    )

    def cascade_round(cur, body, table):
        levels, root = tree_arrays_with_root(cur, n)
        body = jnp.concatenate([body, len64_arr, hex_words(root)])
        fs = shake256_words(jnp.concatenate([count_arr, body]))
        alpha = alpha_mont_from_fs(fs)
        return levels, root, body, fold_mont(cur, alpha, table)

    total += lowered_size(
        "cascade_r0", cascade_round, z(full),
        jnp.zeros(body_len, jnp.uint8), z((8, n // 2)),
    )

    # mont_inv / degree probe / combination
    from stark_tpu.ops import field_ops as fo

    total += lowered_size("mont_inv", fo.mont_inv, z(full))

    def probe_two(st, t):
        outs = []
        for i in range(2):
            zb = core._restrict_iszero_raw(st[i], t).reshape(-1)
            idx = jax.lax.iota(jnp.int32, zb.shape[0])
            outs.append(jnp.max(jnp.where(zb, 0, idx)))
        return jnp.stack(outs)

    total += lowered_size(
        "degree_probe(2)", probe_two, z((2,) + full), core._inv_tabs
    )

    group_cws, structure = stark._device_air_groups(
        core, model._constraints
    )
    comb = core.combination_fn(structure, stark.num_registers,
                               stark.expansion_factor)
    k_tc = len(model._constraints)
    total += lowered_size(
        "combination",
        comb.__wrapped__,
        tuple(z(full) for _ in range(stark.num_registers)),
        tuple(z(full) for _ in group_cws),
        tuple(z(full) for _ in range(k_tc)),
        z(full),
        tuple(z(full) for _ in range(stark.num_registers)),
        z((8, 1 + 2 * k_tc + 2 * stark.num_registers)),
        tuple(z(full) for _ in range(k_tc)),
        tuple(z(full) for _ in range(stark.num_registers)),
    )

    print(f"{'TOTAL':24s} {total/1e6:8.2f} MB")


if __name__ == "__main__":
    main()
