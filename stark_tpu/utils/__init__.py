"""Utilities: structured logging and lightweight profiling."""

from .logging import get_logger
from .profiling import Timer, profile_region

__all__ = ["get_logger", "Timer", "profile_region"]
