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
