"""Native host tier: C++ dense factorisations via ctypes.

The shared library is compiled on demand from ``linear_solvers.cpp`` with
the system toolchain and cached next to the source.  It provides the CPU
reference/fallback implementations of the factorisation kernels
(unpivoted LDL^T with pivot floor, Bunch-Kaufman symmetric-indefinite)
used for parity testing of the device kernels and for host-side solves.
"""

from .native import (NativeLinearSolvers, available, bunch_kaufman_factor,
                     bunch_kaufman_solve, ldlt_factor, ldlt_factor_solve_batch,
                     ldlt_solve)

__all__ = ["NativeLinearSolvers", "available", "bunch_kaufman_factor",
           "bunch_kaufman_solve", "ldlt_factor", "ldlt_factor_solve_batch",
           "ldlt_solve"]
