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


def bench_fused(data, backend):
    """Full solves inside the fused whole-solve Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.formulations import Settings
    from ipmzoo_tpu.models.fused import FusedBatchedIPM

    import statistics
    fused = FusedBatchedIPM(Settings(), n=N, m_ineq=M_INEQ,
                            dtype=jnp.float32, tol=1e-5, max_iter=30)
    solve = jax.jit(fused.solve_fused)
    out = solve(data)
    jax.block_until_ready(out["x"])
    conv = float(jnp.mean(out["converged"].astype(jnp.float32)))
    if conv < 0.99:
        raise RuntimeError(f"fused solver convergence too low: {conv}")
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = solve(data)
        jax.block_until_ready(out["x"])
        times.append(time.perf_counter() - t0)
    iters = float(jnp.mean(out["iterations"]))
    its_per_sec = BATCH * iters / statistics.median(times)
    label = (f"IPM iterations/s, {BATCH} batched QPs fully solved in one "
             f"fused Pallas kernel (n={N}, m={M_INEQ}, {backend}, "
             f"{conv * 100:.2f}% converged)")
    return label, its_per_sec


def bench_steps(data, backend):
    """Vmapped-step path (XLA), fallback when Pallas is unavailable."""
    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.formulations import Settings
    from ipmzoo_tpu.models import CompiledIPM

    solver = CompiledIPM(Settings(), n=N, m_ineq=M_INEQ, dtype=jnp.float32,
                         tol=1e-6)
    init = jax.jit(jax.vmap(solver.init_state))
    step = jax.jit(jax.vmap(solver._step_impl))
    state = init(data)
    state = step(state, data)
    jax.block_until_ready(state.vars)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state = step(state, data)
    jax.block_until_ready(state.vars)
    t1 = time.perf_counter()
    label = (f"IPM iterations/s, {BATCH} batched QPs, vmapped step "
             f"(n={N}, m={M_INEQ}, {backend})")
    return label, BATCH * STEPS / (t1 - t0)


def bench_sharded(data, backend):
    """dp-sharded batched stepping over all visible devices.

    On a single chip this equals bench_steps; on a pod slice the batch
    shards over the mesh with no hot-path communication, so iterations/s
    scale with device count (modulo load imbalance). Reports aggregate
    throughput plus per-device efficiency vs a single-device run."""
    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.formulations import Settings
    from ipmzoo_tpu.models import CompiledIPM
    from ipmzoo_tpu.parallel.mesh import batch_sharding, make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh()
    solver = CompiledIPM(Settings(), n=N, m_ineq=M_INEQ, dtype=jnp.float32,
                         tol=1e-6)
    data = jax.device_put(data, batch_sharding(mesh))
    init = jax.jit(jax.vmap(solver.init_state))
    step = jax.jit(jax.vmap(solver._step_impl))
    state = init(data)
    state = step(state, data)
    jax.block_until_ready(state.vars)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state = step(state, data)
    jax.block_until_ready(state.vars)
    t1 = time.perf_counter()
    label = (f"IPM iterations/s, {BATCH} batched QPs, dp-sharded over "
             f"{n_dev} device(s) (n={N}, m={M_INEQ}, {backend})")
    return label, BATCH * STEPS / (t1 - t0)


def bench_kkt(data, backend):
    """Batched KKT factor+solve throughput (GFLOP/s/chip) via the Pallas
    VMEM-resident kernels."""
    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.ops.pallas_ldlt import (batched_ldlt_pallas,
                                            batched_solve_ldlt_pallas)
    rng = np.random.default_rng(0)
    B, n1, n2 = BATCH, N + M_INEQ, M_INEQ   # augmented-ish sizing
    n = n1 + n2
    M = rng.normal(size=(B, n, n)).astype(np.float32)
    A = jnp.asarray(np.einsum("bij,bkj->bik", M, M) / n +
                    np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)

    @jax.jit
    def factor_solve(A, b):
        L, D = batched_ldlt_pallas(A)
        return batched_solve_ldlt_pallas(L, D, b)

    out = factor_solve(A, b)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = factor_solve(A, b)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    flops = B * (n ** 3 / 3 + 2 * n * n) * 2
    gflops = flops * reps / (t1 - t0) / 1e9
    label = (f"batched KKT LDL^T factor+solve, {B} systems of dim {n} "
             f"({backend}, Pallas)")
    return label, gflops, "GFLOP/s"


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    data = make_batch(BATCH, N, M_INEQ, jnp.float32)
    # Default engine: the vmapped-step XLA path — robust across
    # environments. The fused whole-solve Pallas kernel (BENCH_MODE=fused)
    # measured 0.134 ms median per 10240-QP batch solve on v5e (~7x
    # faster), but a tunnelled-TPU environment wedged once while driving
    # it, so the default stays on the proven path; see models/fused.py.
    mode = os.environ.get("BENCH_MODE", "steps")
    unit = "iterations/s"
    baseline = REFERENCE_ITERS_PER_SEC
    try:
        if mode == "fused" and backend == "tpu":
            label, value = bench_fused(data, backend)
        elif mode == "sharded":
            label, value = bench_sharded(data, backend)
        elif mode == "kkt":
            label, value, unit = bench_kkt(data, backend)
            # reference LDL^T factor+solve measured at 2.88 GFLOP/s
            # single-core on this host (n=48 dense, its LinearSolvers
            # driven by a timing harness)
            baseline = 2.88
        else:
            label, value = bench_steps(data, backend)
    except Exception:
        label, value = bench_steps(data, backend)

    print(json.dumps({
        "metric": label,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
    }))


def _probe_accelerator(timeout_s: int = 180) -> bool:
    """Check in a subprocess that the configured JAX backend can actually
    execute (a wedged TPU tunnel hangs instead of failing); on timeout,
    fall back to CPU so the benchmark always reports a number."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((64, 64));"
            "print(float((x @ x).sum()))")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=timeout_s)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if not _probe_accelerator():
        sys.stderr.write("bench: accelerator probe failed/hung; "
                         "falling back to CPU\n")
        os.environ["JAX_PLATFORMS"] = "cpu"
    main()
