"""Parallel ahead-of-time compilation of the device prover's modules.

A cold prove at TPU scale triggers ~15 large XLA/Mosaic compiles
SEQUENTIALLY (each stage's first call blocks on its own module).  On
this machine's remote-compile tunnel one large module costs 60-100 s, so
the first fib-2^16 prove paid 20+ minutes of wall clock before doing any
useful work.  The compile service parallelizes across client threads
almost perfectly (measured: 3 concurrent 2^19 Pallas NTT compiles in
95 s wall vs ~255 s serial), so this module enumerates every big module
a given STARK configuration will need — with the exact shapes,
transcript-prefix lengths and object counts the real prove produces —
and compiles them on a thread pool.  The real prove then finds every
executable in the in-process and persistent caches.

The enumeration is pinned against reality by
tests/test_precompile.py: after ``precompile_stark`` the cache keys a
real prove touches must be a subset of the precompiled ones.

No reference counterpart (the Rust crate compiles nothing); this is
TPU-operations tooling for cold-start latency.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import NUM_LIMBS


def parallel_warm(
    jobs: Sequence[Tuple[str, Callable[[], object]]],
    threads: int = 6,
    progress: Callable[[str], None] = None,
) -> Dict[str, float]:
    """Run compile-triggering thunks on a thread pool; returns
    name -> seconds.  Exceptions are recorded (as negative durations
    would be useless, the message is logged) but never propagate — a
    failed warm job just means that module compiles lazily later.
    ``progress`` (if given) is called with a short line as each job
    finishes — cold giants compile for many minutes, and a silent pool
    is indistinguishable from a hung tunnel."""
    from ..utils import get_logger

    log = get_logger("stark_tpu.precompile")
    timings: Dict[str, float] = {}

    def run(name_fn):
        name, fn = name_fn
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.block_until_ready(out)
            timings[name] = round(time.perf_counter() - t0, 2)
            if progress is not None:
                progress(f"warm {name}: {timings[name]}s")
        except Exception as e:  # noqa: BLE001 — warm-up must never fail
            log.warning("precompile job %s failed: %s", name, e)
            timings[name] = -1.0
            if progress is not None:
                progress(f"warm {name} FAILED: {str(e)[:120]}")
        return name

    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(run, jobs))
    return timings


def _zeros(shape) -> jnp.ndarray:
    return jnp.zeros(shape, dtype=jnp.uint32)


def stark_precompile_jobs(stark, transition_constraints, trace_length: int):
    """(phase1, phase2) job lists covering the device-resident prove of
    ``stark`` for a ``trace_length``-cycle trace.  Phase 1 modules are
    mutually independent; phase 2 (the combination megakernel) reuses
    the RS-extend module, so it runs after phase 1 to avoid compiling
    the same module twice concurrently."""
    from ..ops import field_ops as fo
    from .device_merkle import DEVICE_TREE_MIN, TAIL_WIDTH, _tree_fn

    core = stark._device_core()
    n = stark.fri_domain_length
    num_registers = stark.num_registers
    m_trace = trace_length + stark.num_randomizers
    full = (NUM_LIMBS, n)

    # SLOWEST FIRST: the fused trace interpolation, the FRI cascade
    # rounds and the device Merkle tree are the largest modules (tens of
    # MB serialized, minutes each cold through the tunnel) — they must
    # enter the pool before the small jobs so they define the critical
    # path instead of extending it (round-3 forensics: the 598 s interp
    # module started ~950 s in because it was queued mid-list)
    phase1: List[Tuple[str, Callable[[], object]]] = []

    if m_trace > 256 and hasattr(core, "extend_mont"):
        from .geometric_device import device_geometric_interpolate

        omicron = stark.omicron.value

        def interp():
            return device_geometric_interpolate(
                _zeros((NUM_LIMBS, m_trace)), 1, omicron
            )

        phase1.append(("interp", interp))

    device_floor = max(DEVICE_TREE_MIN, 2 * TAIL_WIDTH)
    if n >= device_floor:
        phase1.append(("tree", lambda: _tree_fn(n)(_zeros(full))))

    # the fused FRI cascade's per-round modules: replicate fri.py's
    # round count and the transcript-prefix arithmetic exactly —
    # count0 = the bq roots + randomizer root already pushed; each round
    # appends one 64-char hex root = 8-byte length + 64 bytes = 72
    rounds = stark.fri.num_rounds()
    k = 0
    while k < rounds - 1 and (n >> k) >= device_floor:
        k += 1
    if k >= 2 and hasattr(core, "_cascade_round_fn"):
        count0 = num_registers + 1
        body_len0 = 72 * count0
        for r in range(k):
            n_r = n >> r

            def cascade(r=r, n_r=n_r):
                fn = core._cascade_round_fn(
                    n_r, body_len0 + 72 * r, count0 + r + 1
                )
                return fn(
                    _zeros((NUM_LIMBS, n_r)),
                    jnp.zeros(body_len0 + 72 * r, dtype=jnp.uint8),
                    _zeros((NUM_LIMBS, n_r // 2)),
                )

            phase1.append((f"cascade_r{r}", cascade))

    phase1.append(("mont_inv", lambda: fo.mont_inv(_zeros(full))))
    phase1.append(("ext", lambda: core._ext_jit(_zeros(full), core._fwd_tabs)))
    phase1.append(
        ("ext_mont", lambda: core._ext_mont_jit(
            _zeros((NUM_LIMBS, m_trace)), core._fwd_tabs))
    )

    def probe():
        k_tc = len(transition_constraints)
        return core.degree_probe(_zeros((k_tc,) + full))

    phase1.append(("degree_probe", probe))

    # geometric-table builders (_geometric_from_bits is jitted per static
    # length): the x^shift columns and fold inverse tables at n, and the
    # per-round halves the cascade's host loop builds sequentially
    from .device_prover import geometric_table

    geo_sizes = {n} | {(n >> r) // 2 for r in range(max(k, 1))}
    for sz in sorted(geo_sizes, reverse=True):
        phase1.append(
            (f"geo_{sz}", lambda sz=sz: geometric_table(3, 1, sz))
        )

    def combination():
        group_cws, structure = stark._device_air_groups(
            core, transition_constraints
        )
        fn = core.combination_fn(
            structure, num_registers, stark.expansion_factor
        )
        k_tc = len(transition_constraints)
        return fn(
            tuple(_zeros(full) for _ in range(num_registers)),
            tuple(_zeros(full) for _ in group_cws),
            tuple(_zeros(full) for _ in range(k_tc)),
            _zeros(full),
            tuple(_zeros(full) for _ in range(num_registers)),
            _zeros((NUM_LIMBS, 1 + 2 * k_tc + 2 * num_registers)),
            tuple(_zeros(full) for _ in range(k_tc)),
            tuple(_zeros(full) for _ in range(num_registers)),
        )

    phase2 = [("combination", combination)]
    return phase1, phase2


def precompile_stark(
    stark, transition_constraints, trace_length: int, threads: int = 6,
    progress: Callable[[str], None] = None,
) -> Dict[str, float]:
    """Compile every big device module of ``stark``'s prove concurrently
    (see module docstring).  Returns per-module compile seconds."""
    phase1, phase2 = stark_precompile_jobs(
        stark, transition_constraints, trace_length
    )
    timings = parallel_warm(phase1, threads, progress)
    timings.update(parallel_warm(phase2, threads, progress))
    return timings
