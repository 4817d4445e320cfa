"""Trustworthy device timing — canonical implementation lives in
:mod:`stark_tpu.utils.profiling` (see its docstrings for the two
async-dispatch measurement traps it avoids)."""

from stark_tpu.utils.profiling import chain_time, fetch_scalar, measure_rtt  # noqa: F401
