"""Device kernels: factorisations and solves."""

from .ldlt import (PIVOT_FLOOR, batched_ldlt, batched_solve_ldlt,
                   cholesky_solve, ldlt, ldlt_solve, solve_ldlt)

__all__ = ["PIVOT_FLOOR", "batched_ldlt", "batched_solve_ldlt",
           "cholesky_solve", "ldlt", "ldlt_solve", "solve_ldlt"]
