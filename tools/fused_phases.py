#!/usr/bin/env python
"""Phase breakdown of the fused whole-solve kernel and the step path.

Run on the TPU (from /root/repo; the axon plugin needs the cwd):

    python tools/fused_phases.py

Builds one batch tile (bt instances) and slope-times pallas kernels that
run successive prefixes of the fused iteration body:

    assemble | +factor | +2 solves | +metrics x3 | full step

The differences between consecutive rows are the per-phase costs.  Also
times the XLA step path and its Pallas factor/solve kernels in isolation
for comparison.  All numbers are per batch tile per iteration.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_batch
from ipmzoo_tpu.formulations import Settings
from ipmzoo_tpu.models import CompiledIPM
from ipmzoo_tpu.models.fused import FusedBatchedIPM, _ldlt_into_refs
from ipmzoo_tpu.utils.timing import measure_call

N = int(os.environ.get("PH_N", 16))
M = int(os.environ.get("PH_M", 8))
BT = int(os.environ.get("PH_BT", 512))
DT = jnp.float32


def phase_kernel(fused, phase, *refs):
    n_data = len(fused._data_syms)
    in_refs = refs[:n_data]
    out_ref, k_ref, d_ref, xw_ref = refs[n_data:]
    scratch = (k_ref, d_ref, xw_ref)
    bt = fused.bt
    dt = fused.dtype
    import ipmzoo_tpu.models.codegen_soa as soa

    data_tvs = {}
    for (sym, dims), ref in zip(fused._data_syms, in_refs):
        tag = "matrix" if len(dims) == 2 else "vector"
        data_tvs[sym] = soa.TV(tag, ref[...])
    for sym, shape in fused._empty_syms:
        tag = "matrix" if len(shape) == 2 else "vector"
        data_tvs[sym] = soa.TV(tag, jnp.zeros(shape + (bt,), dt))

    o = fused.symbols
    init = {
        o.x: 0.5 * (data_tvs[o.l_x].val + data_tvs[o.u_x].val),
        o.s_A_ineq: 0.5 * (data_tvs[o.l_A_ineq].val +
                           data_tvs[o.u_A_ineq].val),
    }
    var_vals = tuple(init.get(v, jnp.ones((sz, bt), dt))
                     for v, sz in zip(fused.full.variables,
                                      fused.var_sizes))
    mu = jnp.full((1, bt), fused.mu0, dt)
    env = fused._env_soa(data_tvs, var_vals, mu)
    acc = jnp.zeros((1, bt), dt)

    if phase >= 1:                       # assemble
        K = fused._assemble_soa(env, bt)
        acc = acc + jnp.sum(K, axis=(0, 1))[None, :]
    if phase >= 2:                       # factor
        _ldlt_into_refs(K, fused.aug_dim, fused.pivot_floor, k_ref, d_ref)
        acc = acc + d_ref[0, :][None, :]
    if phase >= 3:                       # predictor + corrector solves
        zero_mu = jnp.zeros((1, bt), dt)
        renv = fused._residual_env_soa(env, zero_mu)
        d_aff = fused._search_direction_soa(scratch, renv, bt)
        cenv = fused._residual_env_soa(env, mu, data_tvs=data_tvs,
                                       var_vals=var_vals,
                                       affine_deltas=d_aff, bt=bt)
        d_cc = fused._search_direction_soa(scratch, cenv, bt)
        acc = acc + d_cc[0][0:1, :]
    if phase >= 4:                       # metrics x3 (init/trial/final)
        for k in range(3):
            env0 = dict(env)
            env0[o.mu] = soa.scalar(jnp.zeros((1, bt), dt))
            res, gap = fused._metrics_soa(env0, bt)
            acc = acc + res + gap
    out_ref[...] = acc


def time_phase(fused, arrays, phase):
    bt = fused.bt
    in_specs = [pl.BlockSpec(a.shape, (lambda *_, _nd=a.ndim:
                                       (0,) * _nd),
                             memory_space=pltpu.VMEM) for a in arrays]
    out = pl.pallas_call(
        functools.partial(phase_kernel, fused, phase),
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bt), DT),
        scratch_shapes=[
            pltpu.VMEM((fused.aug_dim, fused.aug_dim, bt), DT),
            pltpu.VMEM((fused.aug_dim, bt), DT),
            pltpu.VMEM((fused.aug_dim, bt), DT),
        ],
        interpret=fused.interpret,
    )
    f = jax.jit(lambda *a: out(*a))
    return measure_call(f, *arrays)


def main():
    data = make_batch(BT, N, M, DT)
    fused = FusedBatchedIPM(Settings(), n=N, m_ineq=M, dtype=DT,
                            tol=1e-5, bt=BT, max_iter=1)
    field_of = {
        fused.symbols.Q: data.Q, fused.symbols.c: data.c,
        fused.symbols.A_ineq: data.A_ineq,
        fused.symbols.l_A_ineq: data.l_A_ineq,
        fused.symbols.u_A_ineq: data.u_A_ineq,
        fused.symbols.A_eq: data.A_eq, fused.symbols.b_eq: data.b_eq,
        fused.symbols.l_x: data.l_x, fused.symbols.u_x: data.u_x,
    }
    arrays = [jnp.moveaxis(jnp.asarray(field_of[s], DT), 0, -1)
              for s, _ in fused._data_syms]

    print(f"fused tile phases (bt={BT}, n={N}, m={M}, "
          f"aug_dim={fused.aug_dim}):")
    prev = 0.0
    names = ["baseline (env only)", "assemble", "+factor",
             "+solves (pred+corr)", "+metrics x3"]
    for phase, name in enumerate(names):
        t = time_phase(fused, arrays, phase)
        print(f"  phase {phase} {name:24s}: {t * 1e3:8.3f} ms "
              f"(delta {(t - prev) * 1e3:8.3f} ms)")
        prev = t

    # one full fused iteration for reference (max_iter=1)
    solve = jax.jit(fused.solve_fused)
    out = solve(data)
    jax.block_until_ready(out["x"])
    t = measure_call(solve, data)
    print(f"  full fused solve (max_iter=1): {t * 1e3:8.3f} ms")

    # step path on the same tile
    solver = CompiledIPM(Settings(), n=N, m_ineq=M, dtype=DT, tol=1e-5)
    stepv = jax.jit(jax.vmap(solver._step_impl))
    state = jax.jit(jax.vmap(solver.init_state))(data)
    from ipmzoo_tpu.utils.timing import measure_chain
    t = measure_chain(lambda s: stepv(s, data), state)
    print(f"  XLA step path, same tile: {t * 1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
