"""ipmzoo_tpu — a TPU-native symbolic + numerical interior-point-method
framework for convex quadratic programming.

Capabilities (re-designed TPU-first from the reference albfre/ipm-zoo):

* :mod:`ipmzoo_tpu.symbolic` — interned expression IR with differentiation
  and simplification (trace-time, pure Python).
* :mod:`ipmzoo_tpu.formulations` — the IPM formulation lattice: slacked
  problems, Lagrangians, KKT conditions, Newton systems and their block
  reductions (augmented system, normal equations).
* :mod:`ipmzoo_tpu.models` — staging of derived systems into jitted XLA
  programs: the Mehrotra predictor-corrector solver as a
  ``lax.while_loop`` with zero per-iteration host round-trips.
* :mod:`ipmzoo_tpu.ops` — device kernels: dense/batched LDL^T and
  Cholesky factorisation (jnp reference + Pallas TPU kernels).
* :mod:`ipmzoo_tpu.native` — C++ host tier: LDL^T and Bunch-Kaufman
  reference solvers via a ctypes-loaded shared library.
* :mod:`ipmzoo_tpu.parallel` — batched (vmap/shard_map) and
  block-separable (Schur complement) multi-chip solving over a
  ``jax.sharding.Mesh``.
* :mod:`ipmzoo_tpu.frontend` — CLI demos and LaTeX/web emitters of the
  derivations.
"""

__version__ = "0.1.0"

# Convenience top-level API: the names a user needs for the common path.
from .formulations import (Bounds, EqualityHandling,  # noqa: E402
                           InequalityHandling, Settings, VariableNames)


def __getattr__(name):
    # heavier imports (jax) stay lazy so `import ipmzoo_tpu` is instant
    if name in ("CompiledIPM", "QPData", "SolveResult", "IPMState",
                "RiccatiIPM", "MPCData", "MPCSolveResult",
                "ArrowIPM", "ArrowQPData", "ArrowSolveResult"):
        from . import models
        return getattr(models, name)
    if name == "FusedBatchedIPM":
        from .models.fused import FusedBatchedIPM
        return FusedBatchedIPM
    if name == "SchurIPM":
        from .parallel.schur import SchurIPM
        return SchurIPM
    raise AttributeError(name)
