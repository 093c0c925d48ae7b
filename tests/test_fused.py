"""Fused whole-solve kernel (interpret mode): lockstep with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipmzoo_tpu.formulations import Bounds, Settings
from ipmzoo_tpu.models import CompiledIPM, QPData
from ipmzoo_tpu.models.fused import FusedBatchedIPM


def make_batch(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    Q = np.einsum("bij,bkj->bik", M, M) / n + np.eye(n)
    return QPData(
        Q=jnp.asarray(Q, jnp.float64),
        c=jnp.asarray(rng.normal(size=(B, n)), jnp.float64),
        A_ineq=jnp.asarray(rng.normal(size=(B, m, n)), jnp.float64),
        l_A_ineq=jnp.asarray(-np.abs(rng.normal(size=(B, m))) - 1,
                             jnp.float64),
        u_A_ineq=jnp.asarray(np.abs(rng.normal(size=(B, m))) + 1,
                             jnp.float64),
        A_eq=jnp.zeros((B, 0, n), jnp.float64),
        b_eq=jnp.zeros((B, 0), jnp.float64),
        l_x=jnp.full((B, n), -5.0, jnp.float64),
        u_x=jnp.full((B, n), 5.0, jnp.float64))


def test_fused_matches_xla_solver():
    B, n, m = 8, 6, 3
    data = make_batch(B, n, m)
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp")
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64)
    r = ref.solve_batch(data)
    f = fused.solve_fused(data)
    assert bool(jnp.all(r.converged)) and bool(jnp.all(f["converged"]))
    np.testing.assert_array_equal(np.asarray(r.iterations),
                                  np.asarray(f["iterations"]).astype(int))
    np.testing.assert_allclose(np.asarray(f["x"]), np.asarray(r.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f["gap"]), np.asarray(r.gap),
                               rtol=1e-6, atol=1e-14)


def test_fused_gondzio_matches_xla_solver():
    """In-kernel Gondzio rounds (gondzio=k) are in lockstep with the
    XLA solver's _gondzio_round — same constants, same accept rule."""
    B, n, m = 8, 6, 3
    data = make_batch(B, n, m, seed=11)
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", gondzio=2)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64)
    r = ref.solve_batch(data)
    f = fused.solve_fused(data, gondzio=2)
    assert bool(jnp.all(r.converged)) and bool(jnp.all(f["converged"]))
    np.testing.assert_array_equal(np.asarray(r.iterations),
                                  np.asarray(f["iterations"]).astype(int))
    np.testing.assert_allclose(np.asarray(f["x"]), np.asarray(r.x),
                               rtol=1e-12, atol=1e-12)


def test_fused_batch_padding():
    # batch not a multiple of the tile: padding instances must not leak
    B, n, m = 5, 4, 2
    data = make_batch(B, n, m, seed=3)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64)
    f = fused.solve_fused(data)
    assert f["x"].shape == (B, n)
    assert bool(jnp.all(f["converged"]))


def test_fused_box_only():
    B, n = 6, 5
    data = make_batch(B, n, 0, seed=4)
    fused = FusedBatchedIPM(Settings(inequalities=Bounds.NONE), n=n,
                            bt=8, dtype=jnp.float64)
    ref = CompiledIPM(Settings(inequalities=Bounds.NONE), n=n,
                      dtype=jnp.float64, kernel="jnp")
    f = fused.solve_fused(data)
    r = ref.solve_batch(data)
    np.testing.assert_allclose(np.asarray(f["x"]), np.asarray(r.x),
                               atol=1e-11)


def test_fused_refined_converges_full_batch():
    """The hybrid engine (fused core + in-jit Gondzio anti-cycling
    tail) converges every instance and agrees with the XLA path."""
    B, n, m = 16, 6, 3
    data = make_batch(B, n, m, seed=3)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=40)
    out = fused.solve_fused_refined(data, tail_cap=4, tail_iters=30)
    assert bool(jnp.all(out["converged"]))
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", max_iter=40)
    r = ref.solve_batch(data)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(r.x),
                               rtol=1e-9, atol=1e-9)


def test_fused_refined_tail_rescues_straggler():
    """An instance the fused core cannot finish in its budget is
    restarted and solved by the Gondzio tail."""
    B, n, m = 8, 6, 3
    data = make_batch(B, n, m, seed=5)
    # starve the fused core: 4 iterations is not enough to converge
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=4)
    core = fused.solve_fused(data)
    assert not bool(jnp.all(core["converged"]))
    out = fused.solve_fused_refined(data, tail_cap=8, tail_iters=40)
    assert bool(jnp.all(out["converged"]))
    # per-instance iteration accounting: tail instances accumulate on
    # top of the fused budget
    rescued = ~np.asarray(core["converged"])
    assert (np.asarray(out["iterations"])[rescued] > 4).all()


def test_fused_compact_matches_refined():
    """The compaction-scheduled fused solve (warm-started resume stages)
    reaches the same solutions as the single-stage engine."""
    B, n, m = 24, 6, 3
    data = make_batch(B, n, m, seed=7)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=40)
    ref = fused.solve_fused_refined(data, tail_cap=8)
    out = fused.solve_fused_compact(data, schedule=[(7, 1), (33, 3)],
                                    tail_cap=8)
    assert bool(jnp.all(out["converged"]))
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(ref["x"]),
                               rtol=1e-9, atol=1e-9)
    # iteration accounting is cumulative across resume stages: totals
    # match the single-stage engine (same iterates, same counts)
    np.testing.assert_allclose(np.asarray(out["iterations"]),
                               np.asarray(ref["iterations"]))


def test_fused_compact_capacity_overflow_mopped_up():
    """A resume stage whose 1/divisor capacity cannot hold the active
    set (cap 8 of ~24 actives here) must not cost convergence: the
    full-batch mop-up resume stage finishes the overflow."""
    B, n, m = 24, 6, 3
    data = make_batch(B, n, m, seed=21)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=40)
    out = fused.solve_fused_compact(data, schedule=[(1, 1), (3, 3)],
                                    tail_cap=8)
    assert bool(jnp.all(out["converged"]))
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", max_iter=40)
    r = ref.solve_batch(data)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(r.x),
                               rtol=1e-7, atol=1e-7)


def test_fused_padded_public_entries():
    """Non-aligned batches through every public entry: the batch is
    replicate-padded BEFORE the kernel/jit region (safe-by-construction,
    VERDICT r2 task 8) and results are sliced back to the true size."""
    B, n, m = 11, 4, 2   # 11 % 8 != 0
    data = make_batch(B, n, m, seed=9)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=40)
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", max_iter=40)
    r = ref.solve_batch(data)
    for out in (fused.solve_fused(data),
                fused.solve_fused_refined(data, tail_cap=8),
                fused.solve_fused_compact(data, schedule=[(6, 1), (34, 2)],
                                          tail_cap=8)):
        assert out["x"].shape == (B, n)
        assert bool(jnp.all(out["converged"]))
        # compaction resumes warm-started stages, so converged iterates
        # may differ from the straight-through path at the tol scale
        np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(r.x),
                                   rtol=1e-7, atol=1e-7)


def test_fused_compact_escalation_rescues_residual_stuck():
    """The two-float escalation stage finishes instances every f32-level
    stage failed on.  On hardware the real trigger is an instance whose
    f32 ITERATION floor sits just above the tolerance (v5e, tol 1e-6:
    gap 1.4e-14 but exact residual 1.14e-6 — representation, not
    cycling); here we reproduce the topology by starving every earlier
    stage (core budget 4, tails 1 iteration) so only the escalation
    stage can converge the batch."""
    B, n, m = 8, 6, 3
    data = make_batch(B, n, m, seed=5)
    fused = FusedBatchedIPM(Settings(), n=n, m_ineq=m, bt=8,
                            dtype=jnp.float64, max_iter=4)
    starved = fused.solve_fused_compact(data, schedule=[(4, 1)],
                                        tail_iters=1, esc_cap=0)
    assert not bool(jnp.all(starved["converged"]))
    out = fused.solve_fused_compact(data, schedule=[(4, 1)],
                                    tail_iters=1, esc_iters=60)
    assert bool(jnp.all(out["converged"]))
    ref = CompiledIPM(Settings(), n=n, m_ineq=m, dtype=jnp.float64,
                      kernel="jnp", max_iter=60)
    r = ref.solve_batch(data)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(r.x),
                               rtol=1e-6, atol=1e-6)
    # escalated instances accumulate iterations on top of earlier stages
    rescued = ~np.asarray(starved["converged"])
    assert (np.asarray(out["iterations"])[rescued] > 4).all()
