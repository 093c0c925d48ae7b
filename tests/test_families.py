"""QP model families: every generator produces solvable, sane instances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.models import CompiledIPM
from ipmzoo_tpu.models.families import (FAMILIES, mpc, portfolio,
                                        projection, svm_dual)


@pytest.mark.parametrize("name", list(FAMILIES))
def test_single_instance_solves(name):
    fam = FAMILIES[name](seed=1, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, m_ineq=fam.m_ineq,
                         m_eq=fam.m_eq, dtype=jnp.float64, tol=1e-8)
    res = solver.solve(fam.data)
    assert bool(res.converged), name
    assert not bool(res.diverged)


def test_portfolio_constraints_hold():
    fam = portfolio(n_assets=16, seed=2, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, m_eq=1, dtype=jnp.float64)
    res = solver.solve(fam.data)
    w = np.asarray(res.x)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert (w >= -1e-8).all() and (w <= 0.2 + 1e-7).all()


def test_mpc_rate_limits_hold():
    fam = mpc(horizon=5, seed=3, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, m_ineq=fam.m_ineq,
                         dtype=jnp.float64)
    res = solver.solve(fam.data)
    u = np.asarray(res.x)
    du = np.asarray(fam.data.A_ineq) @ u
    assert (np.abs(u) <= 1.0 + 1e-7).all()
    assert (du <= 0.5 + 1e-7).all() and (du >= -0.5 - 1e-7).all()


def test_svm_dual_box():
    fam = svm_dual(n_samples=24, seed=4, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, dtype=jnp.float64)
    res = solver.solve(fam.data)
    a = np.asarray(res.x)
    assert (a >= -1e-8).all() and (a <= 1.0 + 1e-7).all()


def test_projection_matches_scipy():
    from scipy import optimize
    fam = projection(n=10, m=4, seed=5, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, m_ineq=fam.m_ineq,
                         dtype=jnp.float64)
    res = solver.solve(fam.data)
    d = fam.data
    cons = optimize.LinearConstraint(np.asarray(d.A_ineq),
                                     np.asarray(d.l_A_ineq),
                                     np.asarray(d.u_A_ineq))
    p = -np.asarray(d.c)
    out = optimize.minimize(
        lambda x: 0.5 * x @ x - p @ x, np.zeros(fam.n),
        jac=lambda x: x - p,
        bounds=optimize.Bounds(np.asarray(d.l_x), np.asarray(d.u_x)),
        constraints=[cons], method="SLSQP",
        options={"ftol": 1e-14, "maxiter": 500})
    assert out.success
    np.testing.assert_allclose(np.asarray(res.x), out.x, atol=1e-6)


def test_batched_family_solve():
    fam = svm_dual(n_samples=12, batch=6, seed=6, dtype=jnp.float64)
    solver = CompiledIPM(fam.settings, n=fam.n, dtype=jnp.float64)
    res = solver.solve_batch(fam.data)
    assert bool(jnp.all(res.converged))
    assert res.x.shape == (6, 12)
