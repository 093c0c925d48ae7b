#!/usr/bin/env python
"""General-sparsity IPM via nested dissection on a 2D-grid QP.

A box-constrained QP whose Hessian couples variables on a g x g grid
(5-point stencil — think discretised control/estimation fields).  The
KKT sparsity has small separators, so ``CompiledIPM(kernel="nd")``
factors it by nested-dissection block elimination (ops/ndiss.py): the
separator tree and symbolic fill are computed on the host once, and the
device program is O(log n) levels of batched dense block ops instead of
the dense path's O(n^3) factorisation.

    python examples/grid_qp.py [grid_side] [leaf]
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

from ipmzoo_tpu.formulations import Bounds, InequalityHandling, Settings
from ipmzoo_tpu.models import CompiledIPM, QPData


def make_grid_qp(g, seed=0):
    n = g * g
    rng = np.random.default_rng(seed)
    Q = np.zeros((n, n), np.float64)
    for i in range(g):
        for j in range(g):
            v = i * g + j
            for di, dj in ((0, 1), (1, 0)):
                ii, jj = i + di, j + dj
                if ii < g and jj < g:
                    w = 0.25 * rng.normal()
                    Q[v, ii * g + jj] = Q[ii * g + jj, v] = w
    Q[np.arange(n), np.arange(n)] = 4.0 + rng.random(n)
    c = rng.normal(size=n)
    return QPData.make(Q=Q, c=c, l_x=np.full(n, -1.0),
                      u_x=np.full(n, 1.0))


def main(g=24, leaf=32):
    n = g * g
    data = make_grid_qp(g)
    settings = Settings(inequalities=Bounds.NONE,
                        inequality_handling=InequalityHandling.SLACKS)

    nd = CompiledIPM(settings, n=n, dtype=jnp.float64, tol=1e-8,
                     kernel="nd", nd_leaf=leaf)
    t0 = time.time()
    res = nd.solve(data)          # derives the dissection plan, compiles
    t_nd = time.time() - t0
    plan = nd._nd_plan
    print(f"grid {g}x{g} (n={n}): nested dissection, "
          f"{len(plan.levels)} levels, "
          f"flop ratio dense/nd = "
          f"{plan.flops_dense / max(plan.flops_nd, 1):.1f}x")
    print(f"  nd:    converged={bool(res.converged)} "
          f"iters={int(res.iterations)} gap={float(res.gap):.2e} "
          f"({t_nd:.1f}s incl. compile)")

    dense = CompiledIPM(settings, n=n, dtype=jnp.float64, tol=1e-8)
    t0 = time.time()
    res_d = dense.solve(data)
    t_d = time.time() - t0
    dx = float(np.max(np.abs(np.asarray(res.x) - np.asarray(res_d.x))))
    print(f"  dense: converged={bool(res_d.converged)} "
          f"iters={int(res_d.iterations)} ({t_d:.1f}s incl. compile)")
    print(f"  max|x_nd - x_dense| = {dx:.2e}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
