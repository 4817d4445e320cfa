"""Lightweight profiling: wall-clock regions + optional JAX device traces.

The reference's only performance tooling is Criterion benchmark suites;
here profiling is first-class: ``Timer`` collects named region timings
(the prover reports a stage breakdown at debug log level), and
``profile_region`` wraps ``jax.profiler.trace`` for TensorBoard-compatible
device traces when ``STARK_TPU_PROFILE_DIR`` is set.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict


class Timer:
    """Accumulates wall-clock per named region."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def region(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]*1e3:.1f} ms ({self.counts[name]}x)"
            )
        return "; ".join(lines)


def fetch_scalar(x) -> int:
    """Host-fetch one value derived from ``x``, forcing every pending
    computation ``x`` depends on to actually finish."""
    import jax
    import jax.numpy as jnp

    return int(jax.device_get(jnp.max(x[..., :1])))


def measure_rtt(x, repeats: int = 3) -> float:
    """Fetch floor (seconds) for an already-materialized device buffer."""
    fetch_scalar(x)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch_scalar(x)
        best = min(best, time.perf_counter() - t0)
    return best


def chain_time(
    step,
    x0,
    iters: int = 10,
    repeats: int = 3,
    floor_ratio: float = 5.0,
    max_iters: int = 20000,
    details: dict = None,
) -> float:
    """Trustworthy per-op device timing: best-of-``repeats`` seconds for
    one application of ``step``, measured over data-dependent chains
    bracketed by a host fetch.

    Two async-dispatch measurement traps this avoids (both observed on
    this project's remote-tunnel TPU backend, see BENCHMARKS.md):
    ``block_until_ready`` returning before the computation has actually
    finished, and repeat dispatches of byte-identical (executable,
    inputs) pairs being deduplicated.  ``step`` must feed its output to
    the next input so every dispatch is distinct, and the chain is timed
    through ``fetch_scalar`` (minus the separately measured fetch floor,
    which is re-measured per output shape).

    Sub-millisecond ops add a third trap (round-4 forensics: the 2^16
    NTT published a physically impossible 3.3 G coeffs/s): when the whole
    chain is comparable to the fetch floor, the subtraction is pure rtt
    noise.  The chain length therefore AUTO-CALIBRATES — if the measured
    chain is shorter than ``floor_ratio`` x floor (or 50 ms), it is
    re-run with enough iterations that the chain dwarfs the floor, up to
    ``max_iters``.  Pass a ``details`` dict to get the calibration data
    (iters used, floor, raw chain seconds, floor_dominated flag) for
    publishing honest caveats.
    """
    x = step(x0)
    fetch_scalar(x)  # compile + drain
    rtt = measure_rtt(x)

    def run_chain(k: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            xi = x0
            t0 = time.perf_counter()
            for _ in range(k):
                xi = step(xi)
            fetch_scalar(xi)
            best = min(best, time.perf_counter() - t0)
        return best

    target = max(floor_ratio * rtt, 0.05)
    k = iters
    best = run_chain(k)
    # grow until the chain dwarfs the floor (a single growth step
    # under-shoots when the initial chain is itself mostly floor, so the
    # per-op estimate it is based on is a gross over-estimate)
    while best < target and k < max_iters:
        # estimate per-op from the floor-SUBTRACTED chain: the raw
        # chain/k over-estimates per-op when the chain is mostly floor,
        # which would undershoot the needed growth
        per_op = max(best - rtt, 1e-9) / k
        k = min(max_iters, max(2 * k, int(target / per_op) + 1))
        best = run_chain(k)
    floor_dominated = best < floor_ratio * rtt
    # an op faster than the measured fetch floor can make the
    # subtraction non-positive under rtt noise; report the UNsubtracted
    # chain time then (a conservative over-estimate, never a div-by-zero
    # for throughput callers)
    net = best - rtt
    if net <= 0.0:
        net = best
    if details is not None:
        details.update(
            iters=k, floor_s=rtt, chain_s=best,
            floor_dominated=floor_dominated,
        )
    return net / k


@contextlib.contextmanager
def profile_region(name: str):
    """JAX device trace region, active when STARK_TPU_PROFILE_DIR is set."""
    trace_dir = os.environ.get("STARK_TPU_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
