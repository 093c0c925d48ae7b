"""Numerical normal-equations path (kernel='normal').

The reference derives and stores the normal equations in its Optimizer
constructor (/root/reference/src/NumericalOptimization/Optimizer.cpp:39-40,
derivation src/SymbolicOptimization.cpp:465-478) but never consumes them
numerically.  Here kernel='normal' factors the condensed system and
back-substitutes the eliminated x block through the recorded delta
definitions, so it must reproduce the augmented-path solution to solver
tolerance across the formulation lattice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.formulations import (Bounds, EqualityHandling,
                                     InequalityHandling, Settings)
from ipmzoo_tpu.models import CompiledIPM, QPData

Q = np.array([[2.0, 0.5], [0.5, 1.0]])
C = np.array([-1.0, -2.0])


def small_data(with_eq: bool):
    return QPData.make(
        Q=Q, c=C,
        A_ineq=[[1.0, 2.0]], l_A_ineq=[0.5], u_A_ineq=[3.0],
        A_eq=np.ones((1, 2)) if with_eq else None,
        b_eq=[2.0] if with_eq else None,
        l_x=[-4.0, -4.0], u_x=[4.0, 4.0], dtype=jnp.float64)


def random_data(n, m, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    return QPData.make(
        Q=M @ M.T / n + np.eye(n), c=rng.normal(size=n),
        A_ineq=rng.normal(size=(m, n)),
        l_A_ineq=-np.abs(rng.normal(size=m)) - 1,
        u_A_ineq=np.abs(rng.normal(size=m)) + 1,
        l_x=np.full(n, -5.0), u_x=np.full(n, 5.0), dtype=jnp.float64)


@pytest.mark.parametrize("ih", list(InequalityHandling))
@pytest.mark.parametrize("bounds", [Bounds.BOTH, Bounds.LOWER])
def test_normal_matches_augmented_inequalities(ih, bounds):
    settings = Settings(inequalities=bounds, inequality_handling=ih)
    try:
        ne = CompiledIPM(settings, n=2, m_ineq=1, kernel="normal")
    except NotImplementedError:
        pytest.skip("indefinite augmented system: no normal-equations path")
    ref = CompiledIPM(settings, n=2, m_ineq=1)
    d = small_data(False)
    r_ne, r_ref = ne.solve(d), ref.solve(d)
    assert bool(r_ne.converged), (ih, bounds)
    assert float(r_ne.gap) < 1e-8
    np.testing.assert_allclose(np.asarray(r_ne.x), np.asarray(r_ref.x),
                               atol=1e-7)


@pytest.mark.parametrize("eh", [
    EqualityHandling.PENALTY_FUNCTION_WITH_EXTRA_DUAL,
    EqualityHandling.REGULARIZATION,
])
def test_normal_matches_augmented_equalities(eh):
    settings = Settings(equalities=True, equality_handling=eh,
                        inequality_handling=InequalityHandling.SLACKED_SLACKS)
    try:
        ne = CompiledIPM(settings, n=2, m_ineq=1, m_eq=1, kernel="normal")
    except NotImplementedError:
        pytest.skip("indefinite augmented system: no normal-equations path")
    ref = CompiledIPM(settings, n=2, m_ineq=1, m_eq=1)
    d = small_data(True)
    r_ne, r_ref = ne.solve(d), ref.solve(d)
    assert bool(r_ne.converged), eh
    np.testing.assert_allclose(np.asarray(r_ne.x), np.asarray(r_ref.x),
                               atol=1e-7)


def test_normal_larger_random_qp():
    n, m = 48, 12
    d = random_data(n, m)
    ne = CompiledIPM(Settings(), n=n, m_ineq=m, kernel="normal")
    ref = CompiledIPM(Settings(), n=n, m_ineq=m)
    r_ne, r_ref = ne.solve(d), ref.solve(d)
    assert bool(r_ne.converged) and float(r_ne.gap) < 1e-8
    np.testing.assert_allclose(np.asarray(r_ne.x), np.asarray(r_ref.x),
                               atol=1e-6)
    # the condensed factorisation is m x m, far smaller than the
    # augmented system — pin that the reduction actually happened
    assert ne.red_dim == m < ne.aug_dim


def test_normal_vmaps():
    n, m, B = 8, 3, 5
    ds = [random_data(n, m, seed=s) for s in range(B)]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ds)
    ne = CompiledIPM(Settings(), n=n, m_ineq=m, kernel="normal")
    res = ne.solve_batch(batch)
    assert bool(jnp.all(res.converged))
    ref = CompiledIPM(Settings(), n=n, m_ineq=m)
    rr = ref.solve_batch(batch)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(rr.x),
                               atol=1e-6)


@pytest.mark.slow
def test_normal_1k_variable_qp():
    """BASELINE config 3 size class (VERDICT r2 task 3): kernel='normal'
    converges on a 1k-variable dense QP — the size the reduction exists
    for (condensed system is m x m instead of (n+m) x (n+m))."""
    n, m = 1024, 64
    d = random_data(n, m, seed=7)
    ne = CompiledIPM(Settings(), n=n, m_ineq=m, kernel="normal",
                     gondzio=2, scale_tol=True)
    r = ne.solve(d)
    assert bool(r.converged)
    assert float(r.gap) < 1e-8
    assert ne.red_dim == m


def test_unknown_kernel_rejected():
    with pytest.raises(ValueError, match="unknown kernel"):
        CompiledIPM(Settings(), n=2, m_ineq=1, kernel="blokg")
    with pytest.raises(ValueError, match="unknown kernel"):
        CompiledIPM(Settings(), n=2, m_ineq=1, kernel="")
