#!/usr/bin/env python
"""Phase breakdown of the banded+arrow IPM step (VERDICT r4 next #1).

Run on the TPU (from /root/repo; the axon plugin needs the cwd):

    python tools/arrow_phases.py

Each phase of ``ArrowIPM._step_impl`` is timed INSIDE one compiled
program: a ``fori_loop`` runs the phase K times with a 1e-30-scaled
feedback perturbation (so XLA cannot hoist it), for two values of K;
the difference slope is the per-execution phase time with the ~0.13 ms
per-program launch floor of the axon tunnel cancelled exactly.  (A
first version measure_call'd each phase as its own program; the launch
floor then dwarfed every phase — the 'sum of phases' came out 7x the
actual step.)

All numbers are per iteration at the benchmark shape
(n=4096, bandwidth 16, tip 8 by default).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ipmzoo_tpu.models.arrow import ArrowIPM, ArrowQPData
from ipmzoo_tpu.ops.banded import arrow_factor
from ipmzoo_tpu.utils.timing import measure_call

N_ = int(os.environ.get("AP_N", 4096))
B_ = int(os.environ.get("AP_B", 16))
T_ = int(os.environ.get("AP_T", 8))
METHOD = os.environ.get("AP_METHOD", "auto")
DT = jnp.float32
K1, K2 = 4, 16


def make_problem(n, b, t):
    rng = np.random.default_rng(0)
    nb = n - t
    Q = np.zeros((n, n), np.float32)
    for i in range(nb):
        lo, hi = max(0, i - b), min(nb, i + b + 1)
        Q[i, lo:hi] = rng.normal(size=hi - lo) * 0.1
    Q = (Q + Q.T) / 2
    strip = rng.normal(size=(t, n)).astype(np.float32) * 0.1
    Q[nb:, :] = strip
    Q[:, nb:] = strip.T
    Q[nb:, nb:] = (strip[:, nb:] + strip[:, nb:].T) / 2
    Q += np.eye(n, dtype=np.float32) * (2 * b + t)
    c = rng.normal(size=n).astype(np.float32)
    l = np.full(n, -1.0, np.float32)
    u = np.full(n, 1.0, np.float32)
    return Q, c, l, u


def inloop(phase_scalar):
    """Per-execution seconds of ``phase_scalar(eps) -> scalar`` run K
    times inside one program, launch floor cancelled by the K-slope."""
    def make(K):
        @jax.jit
        def f(eps):
            return lax.fori_loop(
                0, K, lambda i, e: phase_scalar(e) * 1e-30, eps)
        return f

    f1, f2 = make(K1), make(K2)
    eps0 = jnp.float32(0.0)
    t1 = min(measure_call(f1, eps0) for _ in range(2))
    t2 = min(measure_call(f2, eps0) for _ in range(2))
    return (t2 - t1) / (K2 - K1)


def main():
    Q, c, l, u = make_problem(N_, B_, T_)
    data, st, blk = ArrowQPData.from_dense(Q, c, l, u, dtype=DT)
    solver = ArrowIPM.for_data(data, structure=st, dtype=DT, tol=1e-5,
                               method=METHOD)
    print(f"arrow phases: n={N_}, bandwidth={B_}, tip={T_}, "
          f"block={blk}, N={data.D.shape[0]}, method={METHOD}, "
          f"backend={jax.default_backend()}")
    state = solver.init_state(data)
    vars_ = state.vars
    rx = state.rx

    rows = {}

    def rec(name, t):
        rows[name] = t
        print(f"  {name:42s}: {t * 1e6:9.1f} us")

    x, lg, lh = vars_
    g, h = x - data.l_x, data.u_x - x
    w = lg / g + lh / h
    nb = solver.N * solver.b
    idx = jnp.arange(solver.b)
    Dc = data.D.at[:, idx, idx].add(
        jnp.reshape(w[:nb], (solver.N, solver.b)))
    tidx = jnp.arange(solver.t)
    Ctc = data.Ct.at[tidx, tidx].add(w[nb:])

    from ipmzoo_tpu.ops.banded import _pl_fits
    use_pl = (METHOD == "pl" or (METHOD == "auto" and
              jax.default_backend() == "tpu" and
              _pl_fits(solver.N, solver.b, max(solver.t, 2))))
    if use_pl:
        from ipmzoo_tpu.ops.cr_pallas import (cr_factor_pallas,
                                              cr_solve_pallas)
        f_kern, s_kern = cr_factor_pallas, cr_solve_pallas
        kname = "pl"
    else:
        from ipmzoo_tpu.ops.banded import cr_factor, cr_solve
        f_kern, s_kern = cr_factor, cr_solve
        kname = "xla-cr"

    fac0 = jax.jit(f_kern)(Dc, data.E)
    factors = jax.jit(lambda D, E, U, Ct: arrow_factor(
        D, E, U, Ct, method=METHOD))(Dc, data.E, data.U, Ctc)
    r1 = jnp.ones((solver.N, solver.b, 1), DT)
    rt = jnp.ones((solver.N, solver.b, solver.t), DT)
    cg, ch = g * lg, h * lh
    trial = tuple(v * (1 - 1e-3) for v in vars_)

    def scal(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return jnp.sum(leaf.ravel()[:8])

    rec(f"cr factor kernel ({kname})", inloop(
        lambda e: scal(f_kern(Dc + e * Dc, data.E))))
    rec("full arrow factor (+W,+tip)", inloop(
        lambda e: scal(arrow_factor(Dc + e * Dc, data.E, data.U, Ctc,
                                    method=METHOD).tip_chol)))
    rec("cr solve k=1", inloop(
        lambda e: scal(s_kern(fac0, r1 + e))))
    rec(f"cr solve k={solver.t}", inloop(
        lambda e: scal(s_kern(fac0, rt + e))))
    rec("full direction (arrow_solve+duals)", inloop(
        lambda e: scal(solver._direction(data, vars_, factors, rx + e,
                                         cg, ch))))
    d0 = jax.jit(lambda: solver._direction(
        data, vars_, factors, rx, cg, ch))()
    rec("max_step (8 ratio reductions)", inloop(
        lambda e: solver._max_step(data, vars_,
                                   tuple(di + e for di in d0))))
    rec("gap_at", inloop(
        lambda e: solver._gap_at(data, tuple(v + e for v in trial))))
    rec("qx structured matvec", inloop(
        lambda e: scal(solver._qx(data, x + e))))
    rec("metrics (qx + residual norms)", inloop(
        lambda e: scal(solver._metrics(data,
                                       tuple(v + e for v in trial)))))

    # full step measured with the same in-loop machinery as the phases
    # (what solve()'s while_loop runs; chained single steps pay the
    # ~0.1 ms program-launch floor)
    from ipmzoo_tpu.models.arrow import ArrowState

    def step_of(e):
        s = ArrowState(vars=tuple(v + e for v in state.vars),
                       mu=state.mu, iteration=state.iteration,
                       residual=state.residual, gap=state.gap,
                       rx=state.rx)
        out = solver._step_impl(s, data)
        return scal(out.vars)

    t_step = inloop(step_of)
    rec("FULL STEP (in-loop)", t_step)

    acct = (rows["full arrow factor (+W,+tip)"]
            + 2 * rows["full direction (arrow_solve+duals)"]
            + 2 * rows["max_step (8 ratio reductions)"]
            + rows["gap_at"]
            + rows["metrics (qx + residual norms)"])
    print(f"  {'sum of phases (1F+2D+2M+G+Me)':42s}: "
          f"{acct * 1e6:9.1f} us  (step = {t_step * 1e6:.1f} us)")


if __name__ == "__main__":
    main()
