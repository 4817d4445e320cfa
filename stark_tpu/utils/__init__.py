"""Utilities: structured logging and lightweight profiling."""

from .logging import get_logger
from .profiling import Timer, chain_time, fetch_scalar, measure_rtt, profile_region

__all__ = [
    "get_logger",
    "Timer",
    "chain_time",
    "fetch_scalar",
    "measure_rtt",
    "profile_region",
]
