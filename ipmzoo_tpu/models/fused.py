"""Fused whole-solve Pallas kernel: the entire Mehrotra IPM in VMEM.

``FusedBatchedIPM`` takes the batched-QP workload to its HBM-traffic
floor: a tile of instances is DMA'd to VMEM once, and ALL solver
iterations — KKT assembly, LDL^T factorisation, predictor, line search,
centering, corrector, update, convergence test — run on-chip; only the
final iterates leave the core.  The vmapped XLA solver re-streams state
and factors through HBM every iteration; this kernel reads the problem
data exactly once.

The kernel body is *generated from the same symbolic derivation* as the
XLA solver: residuals, KKT cells, corrector remainders and
back-substitution formulas are staged through
:mod:`.codegen_soa` (structure-of-arrays evaluation, batch on the lane
axis), so the two paths are numerically in lockstep and every
formulation the augmented reduction supports is fused automatically.

Per-instance convergence is handled with a done-mask: finished instances
freeze while the tile runs until all instances converge (or max_iter).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formulations import Settings, VariableNames, delta_variable
from ..symbolic import expr as E
from . import codegen_soa as soa
from .data import QPData
from .fused_compact import FusedCompactMixin
from .ipm import CompiledIPM

LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# SoA dense LDL^T (functional, in-kernel)
# ---------------------------------------------------------------------------

def _ldlt_into_refs(K: jnp.ndarray, n: int, pivot_floor: float,
                    k_ref, d_ref):
    """Factor K (N, N, BT) IN PLACE in scratch ref k_ref (L overwrites K
    column by column; D goes to d_ref).

    n is static under jit, so the column loop is a PYTHON loop with
    EXACT-width static slices: column j touches only the (N-j-1, j, BT)
    already-factored panel, for the true triangular flop count
    (sum_j (n-j) j = n^3/6 multiply-adds per lane) — the earlier
    fori_loop version read the full (N, N, BT) buffer through masks
    every column, 6x the vector work.  The in-place layout (L strictly
    below the diagonal, untouched K at and above it) halves the VMEM
    footprint; the upper triangle is never read."""
    N, _, BT = K.shape
    dt = K.dtype
    k_ref[...] = K
    d_ref[...] = jnp.ones((N, BT), dt)

    for j in range(n):
        if j == 0:
            d = k_ref[0, 0, :]
            d = jnp.where(d == 0, jnp.asarray(pivot_floor, dt), d)
            d_ref[0, :] = d
            if n > 1:
                k_ref[1:n, 0, :] = k_ref[1:n, 0, :] / d[None, :]
            continue
        lj = k_ref[j, 0:j, :]                               # (j, BT)
        w = lj * d_ref[0:j, :]
        d = k_ref[j, j, :] - jnp.sum(lj * w, axis=0)        # (BT,)
        d = jnp.where(d == 0, jnp.asarray(pivot_floor, dt), d)
        d_ref[j, :] = d
        if j + 1 < n:
            # s_i = sum_{k<j} L[i,k] w_k for the rows below the pivot
            s = jnp.sum(k_ref[j + 1:n, 0:j, :] * w[None, :, :],
                        axis=1)                             # (n-j-1, BT)
            k_ref[j + 1:n, j, :] = \
                (k_ref[j + 1:n, j, :] - s) / d[None, :]


def _solve_from_refs(l_ref, d_ref, x_ref, b: jnp.ndarray, n: int):
    """Solve L D L^T x = b using factored scratch refs; returns x.

    Exact-width unrolled substitutions (see _ldlt_into_refs): the
    forward sweep is column-oriented axpy (x[j+1:] -= L[j+1:, j] x[j]),
    the backward sweep row-oriented reduce — sum_j j = n^2/2 multiply-
    adds per lane each, no masks."""
    N, _, BT = l_ref.shape
    x_ref[...] = b

    for j in range(n - 1):
        x_ref[j + 1:n, :] = x_ref[j + 1:n, :] - \
            l_ref[j + 1:n, j, :] * x_ref[j, :][None, :]
    x_ref[...] = x_ref[...] / d_ref[...]
    for i in range(n - 2, -1, -1):
        s = jnp.sum(l_ref[i + 1:n, i, :] * x_ref[i + 1:n, :], axis=0)
        x_ref[i, :] = x_ref[i, :] - s
    return x_ref[...]


# ---------------------------------------------------------------------------
# Fused solver
# ---------------------------------------------------------------------------

class FusedBatchedIPM(FusedCompactMixin, CompiledIPM):
    """Whole-solve-in-VMEM variant of :class:`CompiledIPM` for batched
    small QPs.  API: ``solve_fused(batched QPData) -> SolveResult``-like
    dict of arrays.

    Measured (v5e, n=16, m=8, 10240 QPs, bt=512, f32, slope-timed — see
    utils/timing.py): ~0.013 ms per 512-instance tile-iteration
    (~1.2 TFLOP/s of VPU work; measured by sloping whole-solve time over
    max_iter), full batch solved to tol 1e-5 in ~4.6 ms (99.99%
    converged — plain Mehrotra cycles on ~1e-4 of instances) or ~6 ms at
    100% with the Gondzio tail (:meth:`solve_fused_refined`) —
    1.4-1.9x the compacted XLA step path.  bt=512 is the sweet spot
    (bt=1024 is slower, bt=2048 exceeds VMEM).  Two historical
    mismeasurements, documented so they are not re-recorded: the round-1
    "0.134 ms/batch" was dispatch latency (non-blocking
    block_until_ready), and an early round-2 "54 ms/batch, 10x slower
    than the step path" was taken through a degraded tunnel — per-
    max_iter slope timing on a healthy device gives the numbers above.
    The factorisation runs IN PLACE in a single scratch buffer to keep
    VMEM headroom for larger batch tiles.

    Non-aligned batches are safe by construction: every public entry
    replicate-pads the whole batch to a tile multiple BEFORE any kernel
    or jit region and slices the results back, so the compiled device
    program is always byte-identical to the validated aligned-batch
    program.  (Historical note, round 2: an earlier version padded
    per-array *inside* the traced region, and that configuration —
    B=10000 with bt=512 — twice wedged a tunnelled-TPU device while the
    same kernel was exact in interpreter mode and on aligned batches;
    hoisting the padding out of the traced program removes the only
    difference between the two programs.)"""

    def __init__(self, settings: Settings, n: int, m_ineq: int = 0,
                 m_eq: int = 0, *, bt: int = 512, interpret=None, **kw):
        kw.setdefault("dtype", jnp.float32)
        kw.setdefault("kernel", "jnp")
        super().__init__(settings, n, m_ineq, m_eq, **kw)
        self.bt = bt
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        # data symbols in fixed order for the kernel signature; arrays with
        # a zero dimension cannot be kernel operands (zero-sized blocks)
        # and are bound as empty values inside the kernel instead.
        o = self.symbols
        def shape_of(dims):
            lut = {"n": n, "m": m_ineq, "e": m_eq}
            return tuple(lut[d] for d in dims)
        all_syms = [
            (o.Q, ("n", "n")), (o.c, ("n",)), (o.A_ineq, ("m", "n")),
            (o.l_A_ineq, ("m",)), (o.u_A_ineq, ("m",)), (o.A_eq, ("e", "n")),
            (o.b_eq, ("e",)), (o.l_x, ("n",)), (o.u_x, ("n",)),
        ]
        self._data_syms = [(s, d) for s, d in all_syms
                           if 0 not in shape_of(d)]
        self._empty_syms = [(s, shape_of(d)) for s, d in all_syms
                            if 0 in shape_of(d)]

    # -- env/eval plumbing (SoA) ---------------------------------------

    def _env_soa(self, data_tvs: Dict, var_vals, mu_val) -> soa.Env:
        o = self.symbols
        dt = self.dtype
        env = dict(data_tvs)
        bt = mu_val.shape[-1]
        env[o.delta_eq] = soa.scalar(jnp.full((1, 1), self.delta0, dt))
        env[o.mu] = soa.scalar(mu_val)
        env[o.e_var] = soa.vector(jnp.ones((self.n, 1), dt))
        env[o.e_ineq] = soa.vector(jnp.ones((self.m_ineq, 1), dt))
        env[o.e_eq] = soa.vector(jnp.ones((self.m_eq, 1), dt))
        for var, val in zip(self.full.variables, var_vals):
            env[var] = soa.vector(val)
        return env

    def _metrics_soa(self, env0, bt):
        memo = {}
        dt = self.dtype
        vals = [soa.as_vector(soa.evaluate(r, env0, memo), sz, bt, dt)
                for r, sz in zip(self.full.rhs, self.var_sizes)]
        sq = jnp.zeros((1, bt), dt)
        for v in vals:
            if v.shape[0]:
                sq = sq + jnp.sum(v * v, axis=0, keepdims=True)
        residual = jnp.sqrt(sq)
        comp_size = sum(self.var_sizes[i] for i in self.comp_rows)
        if comp_size == 0:
            gap = jnp.zeros((1, bt), dt)
        else:
            acc = jnp.zeros((1, bt), dt)
            for i in self.comp_rows:
                if vals[i].shape[0]:
                    acc = acc + jnp.sum(jnp.abs(vals[i]), axis=0,
                                        keepdims=True)
            gap = acc / comp_size
        return residual, gap

    def _assemble_soa(self, env, bt):
        dt = self.dtype
        memo = {}
        rows = []
        for i, vi in enumerate(self.aug.variables):
            si = self.aug_sizes[i]
            row = []
            for j, vj in enumerate(self.aug.variables):
                sj = self.aug_sizes[j]
                cell = self.aug.lhs[i][j]
                if cell is E.ZERO:
                    row.append(jnp.zeros((si, sj, bt), dt))
                    continue
                v = soa.evaluate(cell, env, memo)
                if v.tag == "matrix":
                    blk = jnp.broadcast_to(v.val, (si, sj, bt))
                elif v.tag == "diag":
                    eye = jnp.eye(si, dtype=dt)[:, :, None]
                    blk = eye * jnp.broadcast_to(v.val[:, None, :],
                                                 (si, 1, bt))
                elif v.tag == "scalar":
                    eye = jnp.eye(si, dtype=dt)[:, :, None]
                    blk = eye * jnp.broadcast_to(v.val[:, None, :],
                                                 (1, 1, bt))
                else:
                    raise TypeError(f"cell {cell!r} -> {v.tag}")
                row.append(blk)
            rows.append(jnp.concatenate(row, axis=1) if len(row) > 1
                        else row[0])
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def _residual_env_soa(self, env, mu_val, data_tvs=None, var_vals=None,
                          affine_deltas=None, bt=None):
        renv = dict(env)
        renv[self.symbols.mu] = soa.scalar(mu_val)
        memo = {}
        corr_vals = None
        if affine_deltas is not None and self.corrector_rem is not None:
            # taylor="symbolic": one evaluation of the staged remainder
            # (mirrors CompiledIPM._residual_env; keep in lockstep)
            corr_vals = {}
            cenv = dict(env)
            cenv[self.symbols.mu] = soa.scalar(jnp.zeros_like(mu_val))
            for var, dj in zip(self.full.variables, affine_deltas):
                cenv[delta_variable(var)] = soa.vector(dj)
            cmemo = {}
            for vec, rem in self.corrector_rem.items():
                corr_vals[vec] = soa.evaluate(rem, cenv, cmemo)
        elif affine_deltas is not None:
            corr_vals = {}
            zero_mu = jnp.zeros_like(mu_val)
            aff_point = tuple(v + d for v, d in zip(var_vals,
                                                    affine_deltas))
            aenv = self._env_soa(data_tvs, aff_point, zero_mu)
            benv = self._env_soa(data_tvs, var_vals, zero_mu)
            amemo, bmemo, jmemo = {}, {}, {}
            for i, (vec, definition, comp) in enumerate(self.corrector):
                if not comp:
                    continue
                c_shift = soa.evaluate(definition, aenv, amemo)
                c_base = soa.evaluate(definition, benv, bmemo)
                lin = None
                for j, dj in enumerate(affine_deltas):
                    cell = self.full.lhs[i][j]
                    if cell is E.ZERO or dj.shape[0] == 0:
                        continue
                    term = soa.multiply_tv(soa.evaluate(cell, env, jmemo),
                                           soa.vector(dj))
                    lin = term if lin is None else soa.add_tv(lin, term)
                corr = soa.add_tv(c_shift, soa.negate_tv(c_base))
                if lin is not None:
                    corr = soa.add_tv(corr, soa.negate_tv(lin))
                corr_vals[vec] = corr
        for (vec, definition, comp) in self.corrector:
            val = soa.evaluate(definition, renv, memo)
            if corr_vals is not None and vec in corr_vals:
                val = soa.add_tv(val, corr_vals[vec])
            renv[vec] = val
        return renv

    def _search_direction_soa(self, scratch, renv, bt):
        dt = self.dtype
        l_ref, d_ref, x_ref = scratch
        memo = {}
        parts = [soa.as_vector(soa.evaluate(r, renv, memo), sz, bt, dt)
                 for r, sz in zip(self.aug.rhs, self.aug_sizes)]
        b = jnp.concatenate(parts, axis=0)
        sol = _solve_from_refs(l_ref, d_ref, x_ref, b, self.aug_dim)
        deltas = [None] * len(self.full.variables)
        denv = dict(renv)
        offset = 0
        for var, sz in zip(self.aug.variables, self.aug_sizes):
            val = sol[offset:offset + sz]
            offset += sz
            deltas[self.var_index[var]] = val
            denv[delta_variable(var)] = soa.vector(val)
        memo2 = {}
        for dvar, ddef in reversed(self.aug.delta_definitions):
            var = self.delta_to_var[dvar]
            val = soa.as_vector(soa.evaluate(ddef, denv, memo2),
                                self.size_of[var], bt, dt)
            denv[dvar] = soa.vector(val)
            deltas[self.var_index[var]] = val
        return deltas

    def _max_step_soa(self, env, var_vals, deltas, bt):
        dt = self.dtype
        alpha = jnp.ones((1, bt), dt)
        inf = jnp.asarray(jnp.inf, dt)
        for i in self.nonneg_idx:
            v, d = var_vals[i], deltas[i]
            if v.shape[0] == 0:
                continue
            ratio = jnp.where(d < 0, -v / jnp.where(d < 0, d, -1.0), inf)
            alpha = jnp.minimum(alpha, jnp.min(ratio, axis=0, keepdims=True))
        if self.box_test:
            o = self.symbols
            checks = []
            if o.x in self.var_index:
                checks.append((o.x, o.l_x if self.x_has_lb else None,
                               o.u_x if self.x_has_ub else None))
            if o.s_A_ineq in self.var_index:
                checks.append((o.s_A_ineq,
                               o.l_A_ineq if self.s_has_lb else None,
                               o.u_A_ineq if self.s_has_ub else None))
            for var, lb_sym, ub_sym in checks:
                i = self.var_index[var]
                v, d = var_vals[i], deltas[i]
                if v.shape[0] == 0:
                    continue
                if lb_sym is not None:
                    lb = env[lb_sym].val
                    ratio = jnp.where(d < 0, (lb - v) /
                                      jnp.where(d < 0, d, -1.0), inf)
                    alpha = jnp.minimum(alpha,
                                        jnp.min(ratio, axis=0, keepdims=True))
                if ub_sym is not None:
                    ub = env[ub_sym].val
                    ratio = jnp.where(d > 0, (ub - v) /
                                      jnp.where(d > 0, d, 1.0), inf)
                    alpha = jnp.minimum(alpha,
                                        jnp.min(ratio, axis=0, keepdims=True))
        return alpha

    # -- the fused step + loop -----------------------------------------

    def _gondzio_round_soa(self, env, data_tvs, var_vals, scratch, d,
                           alpha, mu_target, bt, beta_min=0.1,
                           beta_max=10.0, delta_alpha=0.1, gamma=0.1):
        """One Gondzio centrality-corrector round inside the kernel —
        the SoA translation of :meth:`CompiledIPM._gondzio_round`
        (ipm.py), same constants, per-lane accept masks."""
        dt = self.dtype
        zero_mu = jnp.zeros((1, bt), dt)
        alpha_t = jnp.minimum(alpha + delta_alpha, 1.0)
        trial = tuple(v + alpha_t * dv for v, dv in zip(var_vals, d))
        tenv = self._env_soa(data_tvs, trial, zero_mu)
        genv = dict(env)
        memo = {}
        for i, (vec, definition, comp) in enumerate(self.corrector):
            sz = self.var_sizes[i]
            if comp and sz:
                p = soa.as_vector(soa.evaluate(definition, tenv, memo),
                                  sz, bt, dt)
                target = jnp.clip(p, beta_min * mu_target,
                                  beta_max * mu_target)
                genv[vec] = soa.vector(p - target)
            else:
                genv[vec] = soa.vector(jnp.zeros((sz, bt), dt))
        dm = self._search_direction_soa(scratch, genv, bt)
        d_new = tuple(dv + dmv for dv, dmv in zip(d, dm))
        alpha_new = self._max_step_soa(env, var_vals, d_new, bt)
        accept = alpha_new >= jnp.minimum(alpha + gamma * delta_alpha,
                                          1.0)
        d_out = tuple(jnp.where(accept, dn, dv)
                      for dn, dv in zip(d_new, d))
        return d_out, jnp.where(accept, alpha_new, alpha)

    def _fused_step(self, data_tvs, var_vals, mu, bt, scratch, gap,
                    gondzio=0):
        # ``gap`` is the duality gap AT var_vals, threaded through the
        # while-loop carry: the end-of-iteration metrics of step i are
        # bitwise the start-of-step metrics of step i+1, so recomputing
        # them here would be a third full _metrics_soa per iteration
        # (measured: evaluation is ~62% of the fused iteration,
        # tools/roofline.py).
        dt = self.dtype
        env = self._env_soa(data_tvs, var_vals, mu)

        K = self._assemble_soa(env, bt)
        k_ref, d_ref, x_ref = scratch
        _ldlt_into_refs(K, self.aug_dim, self.pivot_floor, k_ref, d_ref)

        zero_mu = jnp.zeros((1, bt), dt)
        renv = self._residual_env_soa(env, zero_mu)
        d_aff = self._search_direction_soa(scratch, renv, bt)
        alpha_aff = self._max_step_soa(env, var_vals, d_aff, bt)

        trial = tuple(v + alpha_aff * d for v, d in zip(var_vals, d_aff))
        tenv = self._env_soa(data_tvs, trial, zero_mu)
        _, gap_aff = self._metrics_soa(tenv, bt)
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        sigma = jnp.where(gap > 0, (gap_aff / safe_gap) ** 3, 0.0)
        # dtype-tied mu floor, matching _step_impl (ipm.py): without it
        # an f32 lane whose mu underflows overflows the barrier
        # diagonals (~1/mu^2), goes NaN, and pins its tile at max_iter
        mu_new = jnp.maximum(gap * sigma,
                             jnp.asarray(self.mu_floor, dt)).astype(dt)

        cenv = self._residual_env_soa(env, mu_new, data_tvs=data_tvs,
                                      var_vals=var_vals,
                                      affine_deltas=d_aff, bt=bt)
        d_cc = self._search_direction_soa(scratch, cenv, bt)
        alpha = self._max_step_soa(env, var_vals, d_cc, bt)
        for _ in range(gondzio):
            d_cc, alpha = self._gondzio_round_soa(env, data_tvs, var_vals,
                                                  scratch, d_cc, alpha,
                                                  mu_new, bt)
        step = self.fraction_to_boundary * alpha
        new_vars = tuple(v + step * d for v, d in zip(var_vals, d_cc))
        return new_vars, mu_new

    def _fused_kernel(self, max_iter, warm, gondzio, *refs):
        n_data = len(self._data_syms)
        in_refs = refs[:n_data]
        pos = n_data
        if warm:
            v0_ref, mu0_ref, it0_ref = refs[pos:pos + 3]
            pos += 3
        (x_ref, vars_ref, it_ref, res_ref, gap_ref, mu_ref,
         k_ref, d_ref, xw_ref) = refs[pos:]
        scratch = (k_ref, d_ref, xw_ref)
        bt = self.bt
        dt = self.dtype

        data_tvs = {}
        for (sym, dims), ref in zip(self._data_syms, in_refs):
            val = ref[...]
            tag = "matrix" if len(dims) == 2 else "vector"
            data_tvs[sym] = soa.TV(tag, val)
        for sym, shape in self._empty_syms:
            tag = "matrix" if len(shape) == 2 else "vector"
            data_tvs[sym] = soa.TV(tag, jnp.zeros(shape + (bt,), dt))

        o = self.symbols
        if warm:
            # resume from a previous fused stage (compaction schedule)
            v0 = v0_ref[...]
            var_vals, off = [], 0
            for sz in self.var_sizes:
                var_vals.append(v0[off:off + sz, :])
                off += sz
            var_vals = tuple(var_vals)
            mu = mu0_ref[...]
            iters = it0_ref[...]
        else:
            # initial iterate (midpoints / ones), matching init_state
            init = {
                o.x: 0.5 * (data_tvs[o.l_x].val + data_tvs[o.u_x].val),
                o.s_A_ineq: 0.5 * (data_tvs[o.l_A_ineq].val +
                                   data_tvs[o.u_A_ineq].val),
            }
            var_vals = tuple(
                init.get(v, jnp.ones((sz, bt), dt))
                for v, sz in zip(self.full.variables, self.var_sizes))
            mu = jnp.full((1, bt), self.mu0, dt)
            iters = jnp.zeros((1, bt), dt)

        zero_mu = jnp.zeros((1, bt), dt)
        env0 = self._env_soa(data_tvs, var_vals, zero_mu)
        residual, gap = self._metrics_soa(env0, bt)
        # done mask carried as f32 0/1 — Mosaic cannot yield i1 vectors
        # through a while-loop carry
        done_f = jnp.where((residual < self.tol) & (gap < self.tol),
                           jnp.ones((1, bt), dt), jnp.zeros((1, bt), dt))

        def cond(carry):
            var_vals, mu, residual, gap, done_f, iters, it = carry
            return jnp.logical_and(it < max_iter,
                                   jnp.min(done_f) < 0.5)

        def body(carry):
            var_vals, mu, residual, gap, done_f, iters, it = carry
            done = done_f > 0.5
            new_vars, mu_new = self._fused_step(data_tvs, var_vals, mu, bt,
                                                scratch, gap, gondzio)
            # freeze converged instances
            new_vars = tuple(jnp.where(done, v, nv)
                             for v, nv in zip(var_vals, new_vars))
            mu = jnp.where(done, mu, mu_new)
            nenv = self._env_soa(data_tvs, new_vars, zero_mu)
            n_res, n_gap = self._metrics_soa(nenv, bt)
            residual = jnp.where(done, residual, n_res)
            gap = jnp.where(done, gap, n_gap)
            iters = jnp.where(done, iters, iters + 1.0)
            done_f = jnp.maximum(
                done_f, jnp.where((residual < self.tol) & (gap < self.tol),
                                  1.0, 0.0).astype(dt))
            return new_vars, mu, residual, gap, done_f, iters, it + 1

        carry = (var_vals, mu, residual, gap, done_f, iters,
                 jnp.asarray(0, jnp.int32))
        var_vals, mu, residual, gap, done_f, iters, _ = lax.while_loop(
            cond, body, carry)

        x_ref[...] = var_vals[self.var_index[self.symbols.x]]
        vars_ref[...] = jnp.concatenate(var_vals, axis=0)
        it_ref[...] = iters
        res_ref[...] = residual
        gap_ref[...] = gap
        mu_ref[...] = mu

    # -- public wrapper -------------------------------------------------

    def _pad_batch(self, B: int, tree):
        """Replicate-pad every leaf's batch axis to a multiple of the
        tile size.  Replication (not zeros): zero instances fill their
        lanes with NaN/inf during the solve and never converge, pinning
        their tile at max_iter.  Called OUTSIDE any jit/kernel region so
        the compiled solve program is the aligned-batch program."""
        Bpad = _round_up(B, self.bt)

        def pad(a):
            a = jnp.asarray(a)
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (Bpad - B,) + a.shape[1:])],
                axis=0)

        return jax.tree_util.tree_map(pad, tree)

    def solve_fused(self, data: QPData, state=None, max_iter=None,
                    gondzio: int = 0):
        """Solve a batch of QPs entirely inside one Pallas kernel.

        ``state``: optional warm start — a dict with ``variables``
        (B, total), ``mu`` (B,) and ``iterations`` (B,) from a previous
        ``solve_fused`` result; the kernel resumes from it (compaction
        schedules gather unconverged instances and resume).
        ``max_iter``: per-call override of the iteration budget.
        ``gondzio``: centrality-corrector rounds per iteration, run
        IN-kernel (each adds one extra solve against the existing
        factors + one trial evaluation; the anti-cycling stage of
        :meth:`solve_fused_compact` uses this from a cold restart).

        Any batch size is accepted: non-aligned batches are replicate-
        padded to a tile multiple up front (see :meth:`_pad_batch`) and
        the results sliced back, so the kernel only ever runs the
        aligned-batch program."""
        dt = self.dtype
        B = data.Q.shape[0]
        bt = self.bt
        max_iter = self.max_iter if max_iter is None else max_iter
        if B % bt:
            data, state = self._pad_batch(B, (data, state))
            out = self.solve_fused(data, state, max_iter, gondzio)
            return {k: v[:B] for k, v in out.items()}

        def to_soa(arr, dims):
            # Transpose AFTER the (entry-level) padding: transposing a
            # non-lane-aligned batch is pathologically slow on TPU
            # (measured 0.08 ms vs 31 ms for B=10000 -> lanes).
            return jnp.moveaxis(jnp.asarray(arr, dt), 0, -1)  # (..., B)

        arrays = []
        field_of = {
            self.symbols.Q: data.Q, self.symbols.c: data.c,
            self.symbols.A_ineq: data.A_ineq,
            self.symbols.l_A_ineq: data.l_A_ineq,
            self.symbols.u_A_ineq: data.u_A_ineq,
            self.symbols.A_eq: data.A_eq, self.symbols.b_eq: data.b_eq,
            self.symbols.l_x: data.l_x, self.symbols.u_x: data.u_x,
        }
        for sym, dims in self._data_syms:
            arrays.append(to_soa(field_of[sym], dims))

        total = sum(self.var_sizes)
        warm = state is not None
        if warm:
            arrays.append(to_soa(state["variables"], ("v",)))
            arrays.append(to_soa(state["mu"].reshape(B, 1), ("s",)))
            arrays.append(to_soa(state["iterations"].reshape(B, 1),
                                 ("s",)))

        grid = (B // bt,)

        def spec(a):
            blk = a.shape[:-1] + (bt,)
            nd = a.ndim
            def index_map(i, _nd=nd):
                return (0,) * (_nd - 1) + (i,)
            return pl.BlockSpec(blk, index_map, memory_space=pltpu.VMEM)

        in_specs = [spec(a) for a in arrays]
        out_shapes = (
            jax.ShapeDtypeStruct((self.n, B), dt),
            jax.ShapeDtypeStruct((max(total, 1), B), dt),
            jax.ShapeDtypeStruct((1, B), dt),
            jax.ShapeDtypeStruct((1, B), dt),
            jax.ShapeDtypeStruct((1, B), dt),
            jax.ShapeDtypeStruct((1, B), dt),
        )
        out_specs = tuple(
            pl.BlockSpec(s.shape[:-1] + (bt,),
                         (lambda i, _nd=len(s.shape): (0,) * (_nd - 1) + (i,)),
                         memory_space=pltpu.VMEM)
            for s in out_shapes)

        kernel = functools.partial(self._fused_kernel, max_iter, warm,
                                   gondzio)
        x, allvars, iters, residual, gap, mu = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((self.aug_dim, self.aug_dim, bt), dt),
                pltpu.VMEM((self.aug_dim, bt), dt),
                pltpu.VMEM((self.aug_dim, bt), dt),
            ],
            interpret=self.interpret,
        )(*arrays)

        def from_soa(a):
            return jnp.moveaxis(a, -1, 0)[:B]

        tol = self.tol
        res_b = from_soa(residual)[:, 0]
        gap_b = from_soa(gap)[:, 0]
        return {
            "x": from_soa(x),
            "variables": from_soa(allvars),
            "iterations": from_soa(iters)[:, 0],
            "residual": res_b,
            "gap": gap_b,
            "mu": from_soa(mu)[:, 0],
            "converged": (res_b < tol) & (gap_b < tol),
        }

