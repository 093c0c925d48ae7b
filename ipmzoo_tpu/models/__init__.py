"""Numerical solvers: staged XLA programs derived from symbolic systems."""

from .data import QPData, validate
from .ipm import CompiledIPM, IPMState, SolveResult

__all__ = ["QPData", "validate", "CompiledIPM", "IPMState", "SolveResult"]
