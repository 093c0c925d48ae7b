"""Fused Pallas block-cyclic-reduction vs the XLA reference path.

The kernels must reproduce ops/banded.py's cr_factor/cr_solve solves
(same algorithm, one kernel instead of ~45 level-ops) on SPD
block-tridiagonal systems, including non-power-of-two block counts and
multi-rhs solves (the arrow strip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.ops.banded import bt_factor, bt_solve, cr_factor, cr_solve
from ipmzoo_tpu.ops.cr_pallas import cr_factor_pallas, cr_solve_pallas


def _spd_block_tridiag(N, b, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    D = np.zeros((N, b, b), dtype)
    for i in range(N):
        M = rng.normal(size=(b, b))
        D[i] = M @ M.T / b + (2.0 + 0.5 * i % 3) * np.eye(b)
    E = rng.normal(size=(max(N - 1, 0), b, b)).astype(dtype) * 0.3
    return jnp.asarray(D), jnp.asarray(E)


def _dense(D, E):
    N, b = D.shape[0], D.shape[-1]
    K = np.zeros((N * b, N * b))
    for i in range(N):
        K[i * b:(i + 1) * b, i * b:(i + 1) * b] = np.asarray(D[i])
    for i in range(N - 1):
        blk = np.asarray(E[i])
        K[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = blk
        K[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = blk.T
    return K


@pytest.mark.parametrize("N,b", [(8, 4), (16, 4), (5, 4), (4, 8)])
def test_matches_xla_cr_and_dense(N, b):
    D, E = _spd_block_tridiag(N, b)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(N, b, 1)))

    f_pl = cr_factor_pallas(D, E)
    x_pl = cr_solve_pallas(f_pl, r)

    f_x = cr_factor(D, E)
    x_x = cr_solve(f_x, r)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_x),
                               rtol=0, atol=1e-9)

    # and against a dense solve of the assembled system
    K = _dense(D, E)
    x_d = np.linalg.solve(K, np.asarray(r).reshape(-1))
    np.testing.assert_allclose(np.asarray(x_pl).reshape(-1), x_d,
                               rtol=0, atol=1e-9)


def test_multi_rhs_matches_scan():
    """k=8 right-hand sides (the arrow strip width)."""
    N, b, k = 8, 4, 8
    D, E = _spd_block_tridiag(N, b, seed=2)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=(N, b, k)))
    x_pl = cr_solve_pallas(cr_factor_pallas(D, E), r)
    x_bt = bt_solve(bt_factor(D, E), r)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_bt),
                               rtol=0, atol=1e-9)


def test_single_block():
    D, E = _spd_block_tridiag(1, 4, seed=4)
    rng = np.random.default_rng(5)
    r = jnp.asarray(rng.normal(size=(1, 4, 1)))
    x = cr_solve_pallas(cr_factor_pallas(D, E), r)
    x_d = np.linalg.solve(np.asarray(D[0]), np.asarray(r)[0, :, 0])
    np.testing.assert_allclose(np.asarray(x)[0, :, 0], x_d, atol=1e-10)


def test_f32_shapes():
    """f32, bench-like blocking (small N to keep the test fast)."""
    N, b = 16, 8
    D, E = _spd_block_tridiag(N, b, seed=6, dtype=np.float32)
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.normal(size=(N, b, 1)), jnp.float32)
    x_pl = cr_solve_pallas(cr_factor_pallas(D, E), r)
    x_x = cr_solve(cr_factor(D, E), r)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_x),
                               rtol=0, atol=5e-4)
