"""Utilities: timing, logging/tracing, checkpointing."""

from .timer import Timer, device_trace
from .logging import IterationTrace, solve_summary, logger
from .checkpoint import load_metadata, load_state, save_state

__all__ = ["Timer", "device_trace", "IterationTrace", "solve_summary",
           "logger", "load_metadata", "load_state", "save_state"]
