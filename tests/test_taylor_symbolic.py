"""taylor="symbolic": the Mehrotra corrector's exact quadratic Taylor
remainder staged as ONE simplified expression in the affine-delta
symbols, vs the default three-point numeric computation
(taylor="staged").  The two are the same polynomial identity, so single
steps must agree to float reassociation error across the formulation
slice, and the fused SoA path must stay in lockstep with the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.formulations import (Bounds, EqualityHandling,
                                     InequalityHandling, Settings)
from ipmzoo_tpu.models import CompiledIPM, QPData
from ipmzoo_tpu.models.fused import FusedBatchedIPM

from test_formulation_coverage import data


def _one_step(settings, m_eq, taylor):
    s = CompiledIPM(settings, n=2, m_ineq=1, m_eq=m_eq,
                    dtype=jnp.float64, kernel="jnp", taylor=taylor)
    d = data(m_eq > 0)
    st = s.init_state(d)
    new = s._step_impl(st, d)
    return new


@pytest.mark.parametrize("ih", list(InequalityHandling))
@pytest.mark.parametrize("bounds", [Bounds.BOTH, Bounds.LOWER,
                                    Bounds.UPPER])
def test_step_matches_staged_inequalities(ih, bounds):
    settings = Settings(inequalities=bounds, inequality_handling=ih)
    a = _one_step(settings, 0, "staged")
    b = _one_step(settings, 0, "symbolic")
    for va, vb in zip(a.vars, b.vars):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(b.mu), float(a.mu), rtol=1e-12)


@pytest.mark.parametrize("eh", list(EqualityHandling))
def test_step_matches_staged_equalities(eh):
    settings = Settings(equalities=True, equality_handling=eh,
                        inequality_handling=InequalityHandling.SLACKS)
    try:
        a = _one_step(settings, 1, "staged")
    except NotImplementedError:
        pytest.skip(f"{eh} routes away from the default kernel")
    b = _one_step(settings, 1, "symbolic")
    for va, vb in zip(a.vars, b.vars):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-12, atol=1e-12)


def test_full_solve_equivalence():
    s1 = CompiledIPM(Settings(), n=2, m_ineq=1, dtype=jnp.float64,
                     taylor="staged")
    s2 = CompiledIPM(Settings(), n=2, m_ineq=1, dtype=jnp.float64,
                     taylor="symbolic")
    d = data(False)
    r1, r2 = s1.solve(d), s2.solve(d)
    assert bool(r1.converged) and bool(r2.converged)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               rtol=0, atol=1e-10)


def test_fused_lockstep_symbolic():
    """SoA remainder evaluation stays in lockstep with the XLA path."""
    from test_fused import make_batch
    B, n, m = 8, 6, 3
    d = make_batch(B, n, m, seed=2)
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", taylor="symbolic")
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, taylor="symbolic")
    r = ref.solve_batch(d)
    f = fused.solve_fused(d)
    assert bool(jnp.all(r.converged)) and bool(jnp.all(f["converged"]))
    np.testing.assert_array_equal(np.asarray(r.iterations),
                                  np.asarray(f["iterations"]).astype(int))
    np.testing.assert_allclose(np.asarray(f["x"]), np.asarray(r.x),
                               rtol=1e-12, atol=1e-12)


def test_unknown_taylor_rejected():
    with pytest.raises(ValueError, match="taylor"):
        CompiledIPM(Settings(), n=2, m_ineq=1, taylor="nope")
