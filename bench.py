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

# default batch is tile-aligned (multiple of 512) so the fused engine is
# eligible; see models/fused.py
BATCH = int(os.environ.get("BENCH_BATCH", 10240))
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


def bench_mpc(backend):
    """Structured MPC: batched Riccati IPM solves (block-tridiagonal KKT,
    O(T) per iteration vs the condensed dense path's O(T^3))."""
    import statistics

    import jax
    import jax.numpy as jnp
    from ipmzoo_tpu.models.mpc import RiccatiIPM, random_mpc

    T = int(os.environ.get("BENCH_MPC_T", 32))
    ns = int(os.environ.get("BENCH_MPC_NS", 8))
    nu = int(os.environ.get("BENCH_MPC_NU", 4))
    batch = int(os.environ.get("BENCH_MPC_BATCH", 256))
    data = random_mpc(horizon=T, n_states=ns, n_controls=nu, batch=batch,
                      seed=0, dtype=jnp.float32)
    solver = RiccatiIPM(T, ns, nu, dtype=jnp.float32, tol=1e-5,
                        max_iter=40)
    res = solver.solve_batch(data)
    jax.block_until_ready(res.u)
    conv = float(jnp.mean(res.converged.astype(jnp.float32)))
    if conv < 0.95:
        raise RuntimeError(f"mpc convergence too low: {conv}")
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        res = solver.solve_batch(data)
        jax.block_until_ready(res.u)
        times.append(time.perf_counter() - t0)
    iters = float(jnp.mean(res.iterations))
    its_per_sec = batch * iters / statistics.median(times)
    label = (f"IPM iterations/s, {batch} structured MPC QPs fully solved "
             f"(Riccati, T={T}, ns={ns}, nu={nu}, {backend}, "
             f"{conv * 100:.1f}% converged)")
    return label, its_per_sec


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


def main(force_cpu: bool = False):
    """Run ONE engine (BENCH_MODE in the environment) and print the JSON
    line.  Orchestration across engines/devices happens in __main__,
    which never touches jax itself."""
    import jax
    if force_cpu:
        # the axon TPU plugin overrides JAX_PLATFORMS, so the env var
        # alone does not switch backends — use the config API
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    backend = jax.default_backend()
    data = make_batch(BATCH, N, M_INEQ, jnp.float32)
    mode = os.environ.get("BENCH_MODE", "steps")
    unit = "iterations/s"
    baseline = REFERENCE_ITERS_PER_SEC
    try:
        if mode == "fused" and backend == "tpu":
            label, value = bench_fused(data, backend)
        elif mode == "sharded":
            label, value = bench_sharded(data, backend)
        elif mode == "mpc":
            label, value = bench_mpc(backend)
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


def _run_engine(mode: str, timeout_s: int, force_cpu: bool = False,
                expect: str = ""):
    """Run one engine in a subprocess (BENCH_WORKER=1 -> main());
    returns the parsed JSON record or None on failure/timeout."""
    import subprocess
    env = dict(os.environ, BENCH_MODE=mode, BENCH_WORKER="1")
    if force_cpu:
        env["BENCH_FORCE_CPU"] = "1"
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             capture_output=True, timeout=timeout_s,
                             env=env, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                return None
            if expect and expect not in rec.get("metric", ""):
                return None
            return rec
    return None


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
    if os.environ.get("BENCH_WORKER"):
        # subprocess worker: run exactly the engine named in BENCH_MODE
        main(force_cpu=bool(os.environ.get("BENCH_FORCE_CPU")))
        sys.exit(0)

    # Orchestrator: never touches jax; every engine attempt runs in a
    # guarded subprocess so a wedged TPU tunnel (which HANGS rather than
    # fails) can never take the benchmark down.
    explicit = os.environ.get("BENCH_MODE")
    if explicit:
        rec = _run_engine(explicit, timeout_s=540)
        if rec is not None:
            print(json.dumps(rec))
            sys.exit(0)
        sys.stderr.write(f"bench: BENCH_MODE={explicit} failed; "
                         "falling back\n")

    # NOTE: the fused whole-solve engine (BENCH_MODE=fused) measured
    # 0.134 ms median per aligned 10240-QP batch on a healthy v5e (~7x
    # the step path, ~811,000x the reference), but in THIS tunnelled
    # environment it intermittently hangs the device mid-kernel — and a
    # wedged tunnel stays unresponsive for tens of minutes, which would
    # poison the rest of the benchmark.  It is therefore opt-in only;
    # the default measures the robust vmapped-step engine.
    device_ok = _probe_accelerator()
    if device_ok:
        rec = _run_engine("steps", timeout_s=420)
        if rec is not None:
            print(json.dumps(rec))
            sys.exit(0)

    sys.stderr.write("bench: accelerator unavailable; reporting CPU\n")
    rec = _run_engine("steps", timeout_s=540, force_cpu=True)
    if rec is None:
        raise SystemExit("bench: even the CPU fallback failed")
    print(json.dumps(rec))
