"""Pallas batched kernels (interpret mode on CPU) vs jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.ops.ldlt import batched_ldlt, batched_solve_ldlt
from ipmzoo_tpu.ops.pallas_ldlt import (batched_ldlt_pallas,
                                        batched_solve_ldlt_pallas, ldlt_auto,
                                        solve_ldlt_auto)


def qd_batch(B, n1, n2):
    def one(seed):
        rng = np.random.default_rng(seed)
        H = rng.normal(size=(n1, n1))
        H = H @ H.T + n1 * np.eye(n1)
        S = rng.normal(size=(n2, n2))
        S = S @ S.T + n2 * np.eye(n2)
        A = rng.normal(size=(n2, n1))
        return np.block([[H, A.T], [A, -S]])
    return jnp.asarray(np.stack([one(s) for s in range(B)]))


@pytest.mark.parametrize("B,n1,n2", [(3, 5, 2), (7, 11, 6), (130, 4, 3)])
def test_factor_matches_jnp(B, n1, n2):
    A = qd_batch(B, n1, n2)
    Lp, Dp = batched_ldlt_pallas(A)
    Lx, Dx = batched_ldlt(A, 1e-8)
    np.testing.assert_allclose(np.asarray(Lp), np.asarray(Lx),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Dp), np.asarray(Dx),
                               rtol=1e-10, atol=1e-10)


def test_solve_matches_jnp():
    B, n1, n2 = 5, 8, 4
    n = n1 + n2
    A = qd_batch(B, n1, n2)
    L, D = batched_ldlt_pallas(A)
    b = jnp.asarray(np.random.default_rng(0).normal(size=(B, n)))
    xp = batched_solve_ldlt_pallas(L, D, b)
    xx = batched_solve_ldlt(L, D, b)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xx),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", A, xp)), np.asarray(b),
        rtol=1e-8, atol=1e-8)


def test_custom_vmap_dispatch():
    B, n1, n2 = 4, 6, 3
    n = n1 + n2
    A = qd_batch(B, n1, n2)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(B, n)))
    # unbatched: jnp fallback
    L0, D0 = ldlt_auto(A[0])
    x0 = solve_ldlt_auto(L0, D0, b[0])
    np.testing.assert_allclose(np.asarray(A[0] @ x0), np.asarray(b[0]),
                               atol=1e-8)
    # batched under vmap: pallas kernel, same answers
    Lv, Dv = jax.vmap(ldlt_auto)(A)
    xv = jax.vmap(solve_ldlt_auto)(Lv, Dv, b)
    np.testing.assert_allclose(np.asarray(Lv[0]), np.asarray(L0),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(xv[0]), np.asarray(x0),
                               rtol=1e-9, atol=1e-9)


def test_pivot_floor_in_kernel():
    A = jnp.zeros((2, 4, 4))
    L, D = batched_ldlt_pallas(A)
    assert np.all(np.asarray(D) == 1e-8)
    assert np.all(np.isfinite(np.asarray(L)))


def test_ldlt_auto_large_dim_routes_off_kernel():
    """Batched factor/solve at a dimension whose minimum Pallas tile
    cannot fit VMEM (aug_dim 352 crashed BENCH_MODE=aug at compile on
    hardware) must route to the XLA blocked path and stay correct."""
    from ipmzoo_tpu.ops.pallas_ldlt import _pl_fits
    assert not _pl_fits(352)
    assert _pl_fits(64)
    rng = np.random.default_rng(5)
    n, B = 352, 3
    M = rng.normal(size=(B, n, n))
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + n * np.eye(n), jnp.float64)
    b = jnp.asarray(rng.normal(size=(B, n)), jnp.float64)
    L, D = jax.vmap(ldlt_auto)(A)
    x = jax.vmap(solve_ldlt_auto)(L, D, b)
    r = jnp.einsum("bij,bj->bi", A, x) - b
    assert float(jnp.max(jnp.abs(r))) < 1e-7
