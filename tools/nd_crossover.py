#!/usr/bin/env python
"""Measure the nd-vs-dense crossover on 2D-grid QPs.

For each grid side g: build the grid QP, time one IPM step under
kernel='nd' (nd_fallback=False, Pallas levels) and under the dense auto
kernel, slope-timed; print the measured speedup next to the cost
model's prediction (ops/ndiss.py::nd_predicted_speedup) so
ND_LEVEL_OVERHEAD_FLOPS can be calibrated.  Run on TPU from /root/repo:

    python tools/nd_crossover.py [g1 g2 ...]       # default 16 24 32 48 64
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sides = [int(a) for a in sys.argv[1:]] or [16, 24, 32, 48, 64]
    from ipmzoo_tpu.models import CompiledIPM
    from ipmzoo_tpu.models.families import grid_qp
    from ipmzoo_tpu.ops.ndiss import nd_predicted_speedup
    from ipmzoo_tpu.utils.timing import measure_chain

    print(f"backend={jax.default_backend()}", flush=True)
    from jax import lax
    Ksteps = 8

    def loop_time(s, data):
        stepf = s._step_impl
        pre_fn = getattr(s, "_nd_prework", None)

        @jax.jit
        def k_steps(state):
            pre = pre_fn(data) if (pre_fn is not None and
                                   s._mode == "nd") else None
            return lax.fori_loop(
                0, Ksteps,
                lambda i, st: stepf(st, data, nd_pre=pre), state)

        return measure_chain(k_steps, s.init_state(data)) / Ksteps

    for g in sides:
        n = g * g
        fam = grid_qp(side=g, seed=0, dtype=jnp.float32)
        data = fam.data
        nd = CompiledIPM(fam.settings, n=n, dtype=jnp.float32, tol=1e-5,
                         kernel="nd", nd_leaf=64, nd_fallback=False)
        nd._ensure_nd_plan(data)
        plan = nd._nd_plan
        t_nd = loop_time(nd, data)
        dense = CompiledIPM(fam.settings, n=n, dtype=jnp.float32,
                            tol=1e-5)
        t_dense = loop_time(dense, data)

        print(f"g={g:3d} n={n:5d}: nd {t_nd * 1e3:7.3f} ms "
              f"({len(plan.levels)} levels) vs dense "
              f"{t_dense * 1e3:7.3f} ms = {t_dense / t_nd:5.2f}x "
              f"(model predicts {nd_predicted_speedup(plan):5.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
