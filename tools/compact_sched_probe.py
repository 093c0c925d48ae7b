#!/usr/bin/env python
"""Probe solve_batch_compact schedules at tol 1e-6 (r5): where does the
8.5M -> 2.28M it/s drop at the tighter default tolerance go, and does a
deeper schedule recover it?  Reports conv%, total iterations, time and
useful it/s per schedule (slope-timed)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

sys.argv = sys.argv[:1]
os.environ.setdefault("BENCH_TOL", "1e-6")
import bench
from ipmzoo_tpu.utils.timing import measure_call

data = bench.make_batch(bench.BATCH, bench.N, bench.M_INEQ, jnp.float32)
solver = bench._solver()

schedules = {
    "default(14,1)(12,8)(74,64)": None,
    "deep(16,1)(12,4)(12,16)(60,64)": [(16, 1), (12, 4), (12, 16), (60, 64)],
    "wide(16,1)(16,4)(68,32)": [(16, 1), (16, 4), (68, 32)],
    "k0_18(18,1)(12,8)(70,64)": [(18, 1), (12, 8), (70, 64)],
}
for name, sched in schedules.items():
    try:
        res = solver.solve_batch_compact(data, schedule=sched)
        conv = float(jnp.mean(res.converged.astype(jnp.float32)))
        iters = float(jnp.sum(res.iterations.astype(jnp.float32)))
        t = measure_call(solver.solve_batch_compact, data, schedule=sched) if sched is None else \
            measure_call(lambda d: solver.solve_batch_compact(d, schedule=sched), data)
        print(f"{name}: conv={conv*100:.2f}% iters={iters:.0f} "
              f"t={t*1e3:.2f} ms  => {iters/t/1e6:.2f}M it/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {e}", flush=True)
