"""Numerical solvers: staged XLA programs derived from symbolic systems."""

from ..utils.precision import apply_default_matmul_precision

apply_default_matmul_precision()

from .arrow import ArrowIPM, ArrowQPData, ArrowSolveResult
from .data import QPData, validate
from .ipm import CompiledIPM, IPMState, SolveResult
from .mpc import MPCData, MPCSolveResult, RiccatiIPM

__all__ = ["QPData", "validate", "CompiledIPM", "IPMState", "SolveResult",
           "MPCData", "MPCSolveResult", "RiccatiIPM",
           "ArrowIPM", "ArrowQPData", "ArrowSolveResult"]
