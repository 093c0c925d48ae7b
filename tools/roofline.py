#!/usr/bin/env python
"""Roofline measurement for the fused whole-solve kernel (VERDICT r2 #6).

Measures, on the actual device (run from /root/repo on the TPU):

  1. VPU f32 FMA peak  — a Pallas kernel of independent unrolled FMA
     chains on an (8,128)-aligned VMEM buffer (no loads in the loop
     body, 8 independent accumulators to cover FMA latency).
  2. MXU matmul peak   — chained 1024^2 dots, f32 and bf16-in/f32-acc.
  3. The fused engine's per-phase cost (assemble | factor | solves |
     metrics, via tools/fused_phases.py deltas) and the analytic flop
     count of each phase, giving achieved GFLOP/s and % of VPU peak.

All timings use utils/timing.py slope timing (the only trustworthy
recipe on this tunnelled backend — see that module's docstring).

The output feeds README's "Roofline: why the fused kernel is VPU-bound"
note: the kernel's layout puts the QP batch on the 128-lane axis, so
every contraction (factor columns, triangular solves, residual matvecs)
is lane-independent — MXU-shaped work would require moving matrix dims
onto (sublane, lane), i.e. one (24,24) matmul per instance at
(24/128)^2 = 3.5%% MXU tile density, or block-diagonal packing at <=4%%
density, both below the VPU's achieved throughput.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipmzoo_tpu.utils.timing import measure_call, measure_chain

def _fma_kernel(S, L, chains, reps, x_ref, o_ref):
    x = x_ref[...]
    a = x * 0.999 + 1e-3
    accs = [x * (0.1 * (i + 1)) for i in range(chains)]
    for _ in range(reps):
        accs = [acc * a + x for acc in accs]
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[...] = out


def _vpu_once(S, L, chains, reps):
    x = jnp.linspace(0.0, 1.0, S * L, dtype=jnp.float32).reshape(S, L)
    f = pl.pallas_call(
        functools.partial(_fma_kernel, S, L, chains, reps),
        in_specs=[pl.BlockSpec((S, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        grid=(),
        interpret=jax.default_backend() != "tpu",
    )
    f = jax.jit(f)
    t = measure_call(f, x)
    flops = 2.0 * S * L * chains * reps   # one FMA = 2 flops
    return flops / t, t


def vpu_peak():
    """Max achieved FMA rate over buffer/ILP configurations — the
    realistic VPU ceiling for VMEM-resident elementwise chains."""
    best = (0.0, None)
    for (S, L) in ((64, 128), (8, 512), (64, 512), (256, 512)):
        for chains in (4, 8, 16):
            f, _ = _vpu_once(S, L, chains, 64)
            if f > best[0]:
                best = (f, (S, L, chains))
    return best


def mxu_peak(dtype, n=1024):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)) / n,
                    dtype)

    @jax.jit
    def step(y):
        return jnp.dot(y, a, preferred_element_type=jnp.float32).astype(dtype)

    y0 = jnp.ones((n, n), dtype)
    t = measure_chain(step, y0)
    return 2.0 * n ** 3 / t, t


def fused_flops(N):
    """Analytic flop count per lane, by phase.

    factor: exact from the column loop of _ldlt_into_refs (per column j:
    w = lj*d (j mul) + dot (2j) + trailing axpy-reduce (2j(n-j-1)) +
    divide (n-j-1)).  solve: forward axpy n^2/2 MAs + diag n + backward
    reduce n^2/2 MAs, all x2 flops, per system.
    """
    fac = 0
    for j in range(N):
        fac += j + 2 * j + 2 * j * max(N - j - 1, 0) + max(N - j - 1, 0)
    sol = 2 * (N * N + N)     # one LDL^T solve (fwd + diag + bwd)
    return fac, sol


def _factor_bench_kernel(n, reps, pivot_floor, bt, k0_ref, o_ref,
                         k_ref, d_ref):
    from ipmzoo_tpu.models.fused import _ldlt_into_refs
    K0 = k0_ref[...]
    acc = jnp.zeros((1, bt), jnp.float32)
    for r in range(reps):
        # scale perturbation defeats CSE across repetitions
        _ldlt_into_refs(K0 * (1.0 + 1e-6 * r), n, pivot_floor,
                        k_ref, d_ref)
        acc = acc + d_ref[0:1, :]
    o_ref[...] = acc


def _solve_bench_kernel(n, reps, pivot_floor, bt, k0_ref, b0_ref, o_ref,
                        k_ref, d_ref, x_ref):
    from ipmzoo_tpu.models.fused import _ldlt_into_refs, _solve_from_refs
    _ldlt_into_refs(k0_ref[...], n, pivot_floor, k_ref, d_ref)
    b0 = b0_ref[...]
    acc = jnp.zeros((1, bt), jnp.float32)
    for r in range(reps):
        sol = _solve_from_refs(k_ref, d_ref, x_ref,
                               b0 * (1.0 + 1e-6 * r), n)
        acc = acc + sol[0:1, :]
    o_ref[...] = acc


def _bench_inkernel(make_kernel, inputs, scratch, bt, r1=2, r2=8):
    """Per-repetition seconds via slope between two in-kernel repetition
    counts (cancels kernel entry, DMA and the non-repeated prologue)."""

    def run(reps):
        f = pl.pallas_call(
            make_kernel(reps),
            in_specs=[pl.BlockSpec(a.shape,
                                   (lambda *_, _nd=a.ndim: (0,) * _nd),
                                   memory_space=pltpu.VMEM)
                      for a in inputs],
            out_specs=pl.BlockSpec((1, bt), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, bt), jnp.float32),
            scratch_shapes=scratch,
            grid=(),
            interpret=jax.default_backend() != "tpu",
        )
        return measure_call(jax.jit(f), *inputs)

    t1, t2 = run(r1), run(r2)
    return max((t2 - t1) / (r2 - r1), 1e-12)


def quasidef_tile(N, bt, seed=0):
    """A random diagonally-dominant symmetric (N, N, bt) f32 tile."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((N, N, bt)).astype(np.float32)
    K = A + np.swapaxes(A, 0, 1)
    K[np.arange(N), np.arange(N)] += 4.0 * N
    return jnp.asarray(K)


def main():
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    vf, cfg = vpu_peak()
    print(f"VPU f32 FMA peak : {vf / 1e12:7.3f} TFLOP/s "
          f"(best config {cfg})")
    for dt, name, n in ((jnp.float32, "f32", 1024),
                        (jnp.bfloat16, "bf16-in", 2048)):
        mf, mt = mxu_peak(dt, n)
        print(f"MXU {name:8s} peak: {mf / 1e12:7.3f} TFLOP/s "
              f"({mt * 1e6:.1f} us per {n}^3 dot)")

    # factor / solve microbenchmarks at the fused-engine shape
    N, BT = 24, 512
    pivot_floor = 1e-8
    K0 = quasidef_tile(N, BT)
    b0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, BT)).astype(np.float32))
    scratch2 = [pltpu.VMEM((N, N, BT), jnp.float32),
                pltpu.VMEM((N, BT), jnp.float32)]
    t_fac = _bench_inkernel(
        lambda reps: functools.partial(_factor_bench_kernel, N, reps,
                                       pivot_floor, BT),
        [K0], scratch2, BT)
    t_sol = _bench_inkernel(
        lambda reps: functools.partial(_solve_bench_kernel, N, reps,
                                       pivot_floor, BT),
        [K0, b0], scratch2 + [pltpu.VMEM((N, BT), jnp.float32)], BT)
    fac, sol = fused_flops(N)
    print(f"\nfused-engine shape (aug_dim={N}, bt={BT}), in-kernel "
          f"repetition slopes:")
    print(f"  LDL^T factor: {t_fac * 1e6:8.2f} us/rep  "
          f"{fac * BT / t_fac / 1e12:6.3f} TFLOP/s "
          f"({fac * BT / t_fac / vf * 100:5.1f}% of VPU peak)  "
          f"[{fac} flops/lane]")
    print(f"  LDL^T solve : {t_sol * 1e6:8.2f} us/rep  "
          f"{sol * BT / t_sol / 1e12:6.3f} TFLOP/s "
          f"({sol * BT / t_sol / vf * 100:5.1f}% of VPU peak)  "
          f"[{sol} flops/lane]")
    # per fused iteration: 1 factor + 2 solves; whole-iteration cost from
    # CLAUDE.md slope measurement for the evaluation-overhead split
    t_iter = 13e-6
    t_lin = t_fac + 2 * t_sol
    print(f"  linear algebra per iteration: {t_lin * 1e6:6.2f} us of "
          f"~{t_iter * 1e6:.0f} us measured/iteration "
          f"({t_lin / t_iter * 100:.0f}%); rest = symbolic evaluation "
          f"(assembly, residuals, corrector, metrics)")


if __name__ == "__main__":
    main()
