"""Default matmul precision policy for the library.

On TPU, XLA's DEFAULT precision for f32 ``dot``/``conv`` lowers the
inputs to bfloat16 on the MXU: measured on the v5e bench chip, a
256x256 f32 matmul returns with ~2.3e-3 relative error under DEFAULT
vs 1.6e-7 under HIGHEST (exact f32 via multi-pass).  For an
interior-point library whose convergence tests assert duality gaps of
1e-6..1e-8, silently computing every KKT assembly, residual, and
factorisation matmul to 2e-3 is wrong — the Pallas engines (exact VPU
f32 arithmetic) would disagree with the XLA engines by ~1e-3, and the
XLA full-solve paths could never reach the pinned f32 floor on
hardware.  (Found in round 3 when ``cr_factor_pallas`` matched an f64
oracle to 2.3e-7 while the "reference" XLA cyclic-reduction path was
4.3e-3 off.)

Importing any jax-touching subpackage of ipmzoo_tpu therefore pins
``jax_default_matmul_precision`` to ``highest``.  The hot engines lose
nothing: the per-block matmuls are tiny (b<=32) and latency-bound, and
the fused Pallas kernels never used the MXU anyway.  Callers who want
the throughput-over-accuracy trade-off back (e.g. embedding these ops
inside a bf16 training step) can either set the environment variable
``IPMZOO_MATMUL_PRECISION`` to ``default`` / ``bfloat16`` / ... before
importing, or re-update the jax config after import — this module only
sets the global default, it never wraps individual calls.

The reference implementation has no analogue: its CPU doubles
(/root/reference/src/NumericalOptimization/Evaluation.cpp) are always
exact-precision.  This is the TPU-native port of that guarantee.
"""

from __future__ import annotations

import os

import jax

_APPLIED = False


def apply_default_matmul_precision() -> None:
    """Pin ``jax_default_matmul_precision`` (idempotent, env-overridable).

    Runs once per process; respects an explicit user choice made either
    through ``IPMZOO_MATMUL_PRECISION`` or by having already set the jax
    config themselves (a non-None existing value is left alone).
    """
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True
    want = os.environ.get("IPMZOO_MATMUL_PRECISION", "highest").lower()
    if want in ("", "default", "none"):
        return
    if jax.config.jax_default_matmul_precision is not None:
        return  # the user already chose; don't fight them
    try:
        jax.config.update("jax_default_matmul_precision", want)
    except Exception as e:  # unrecognized value (e.g. a typo in the env
        # var) must not turn into an import crash of the whole library
        import warnings
        warnings.warn(
            f"IPMZOO_MATMUL_PRECISION={want!r} not accepted by jax "
            f"({e}); leaving the matmul precision at its default",
            stacklevel=2)
