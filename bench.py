#!/usr/bin/env python
"""Headline benchmark: IPM iterations/s on a 10k-instance batched-QP
workload (BASELINE.md config 4), run on whatever accelerator JAX sees.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference implementation (single-threaded C++ tree-walking
interpreter + dense LDL^T) solves the same QP class (n=16, m_ineq=8 box
QP, SlackedSlacks) at ~10 iterations per 15.0 ms = 662 iterations/s on
this machine's host CPU (measured with a driver around the reference's
Optimizer, stdout suppressed; see tests/golden/README for provenance).
The reference solves QPs one at a time; its batch-of-10k throughput is
the same 662 it/s.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_ITERS_PER_SEC = 662.0   # reference C++ on this host, n=16 m=8

BATCH = int(os.environ.get("BENCH_BATCH", 10000))
N = int(os.environ.get("BENCH_N", 16))
M_INEQ = int(os.environ.get("BENCH_M", 8))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def make_batch(batch, n, m, dtype):
    import jax.numpy as jnp
    from ipmzoo_tpu.models import QPData
    rng = np.random.default_rng(0)
    M = rng.normal(size=(batch, n, n)).astype(np.float32)
    Q = np.einsum("bij,bkj->bik", M, M) / n + np.eye(n, dtype=np.float32)
    return QPData(
        Q=jnp.asarray(Q, dtype),
        c=jnp.asarray(rng.normal(size=(batch, n)), dtype),
        A_ineq=jnp.asarray(rng.normal(size=(batch, m, n)), dtype),
        l_A_ineq=jnp.asarray(-np.abs(rng.normal(size=(batch, m))) - 1, dtype),
        u_A_ineq=jnp.asarray(np.abs(rng.normal(size=(batch, m))) + 1, dtype),
        A_eq=jnp.zeros((batch, 0, n), dtype),
        b_eq=jnp.zeros((batch, 0), dtype),
        l_x=jnp.full((batch, n), -5.0, dtype),
        u_x=jnp.full((batch, n), 5.0, dtype))


def main():
    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.formulations import Settings
    from ipmzoo_tpu.models import CompiledIPM

    dtype = jnp.float32
    backend = jax.default_backend()
    solver = CompiledIPM(Settings(), n=N, m_ineq=M_INEQ, dtype=dtype,
                         tol=1e-6)
    data = make_batch(BATCH, N, M_INEQ, dtype)
    init = jax.jit(jax.vmap(solver.init_state))
    step = jax.jit(jax.vmap(solver._step_impl))

    state = init(data)
    jax.block_until_ready(state.vars)

    # compile + warmup
    state = step(state, data)
    jax.block_until_ready(state.vars)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state = step(state, data)
    jax.block_until_ready(state.vars)
    t1 = time.perf_counter()

    iters_per_sec = BATCH * STEPS / (t1 - t0)
    print(json.dumps({
        "metric": f"IPM iterations/s, {BATCH} batched QPs "
                  f"(n={N}, m={M_INEQ}, {backend})",
        "value": round(iters_per_sec, 1),
        "unit": "iterations/s",
        "vs_baseline": round(iters_per_sec / REFERENCE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
