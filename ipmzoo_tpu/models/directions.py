"""Search-direction staging for :class:`CompiledIPM`.

``DirectionsMixin`` stages the residual environments (predictor,
corrector with the exact quadratic Taylor remainder, Gondzio
centrality-corrector rounds), the packed solve + symbolic
back-substitution, and the fraction-to-boundary ratio tests.  Split out
of models/ipm.py (round 4) purely for structure; behaviour is unchanged
and pinned by the golden + oracle tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formulations import delta_variable
from ..symbolic import expr as E
from . import codegen as cg


class DirectionsMixin:
    """Residual/corrector environments, solves, and line search."""

    def _build_symbolic_corrector(self):
        """Exact quadratic Taylor remainder of each complementarity row
        as a simplified expression in the affine-delta symbols:

            rem_i = simplify(def_i(v + Delta) - def_i(v)
                             - sum_j lhs[i][j] Delta_j)

        All residual rows are polynomials of degree <= 2 in the
        variables, so the formula is exact by construction; simplify
        cancels the degree-<=1 parts, leaving a handful of elementwise
        ops (e.g. ``(diag(Dg + g) - G)(Dl + l) - Lambda Dg``) instead of
        two extra full-row evaluations plus the Jacobian-delta
        accumulation per corrector phase."""
        rems = {}
        for i, (vec, definition, comp) in enumerate(self.corrector):
            if not comp:
                continue
            shifted = definition
            for v in self.full.variables:
                shifted = shifted.replace(
                    v, E.sum_expr([v, delta_variable(v)]))
            terms = [shifted, E.negate(definition)]
            for j, vj in enumerate(self.full.variables):
                cell = self.full.lhs[i][j]
                if cell is E.ZERO:
                    continue
                terms.append(E.negate(E.product([cell,
                                                 delta_variable(vj)])))
            rems[vec] = E.sum_expr(terms).simplify()
        return rems

    def _residual_env(self, env, mu_val, data=None, var_vals=None,
                      affine_deltas=None):
        """Bind the shorthand residual vectors r_{v} into a new env.

        With ``affine_deltas`` given, complementarity residuals get the
        exact second-order Mehrotra correction
        ``c_i(v + d_aff) - c_i(v) - J_i d_aff`` added (corrector phase).

        ``env`` must match the residual pipeline's precision: a lifted
        two-float env under ``df_residuals`` (the correction term is
        itself pure cancellation, so it benefits the most)."""
        m = self._cgm
        renv = dict(env)
        renv[self.symbols.mu] = m.scalar(jnp.asarray(mu_val, self.dtype))
        memo = {}

        corr_vals = None
        if affine_deltas is not None and self.corrector_rem is not None:
            # taylor="symbolic": one evaluation of the staged remainder
            corr_vals = {}
            cenv = dict(env)
            cenv[self.symbols.mu] = m.scalar(
                jnp.asarray(0.0, self.dtype))
            for var, dj in zip(self.full.variables, affine_deltas):
                cenv[delta_variable(var)] = self._vec_tv(dj)
            cmemo = {}
            for vec, rem in self.corrector_rem.items():
                corr_vals[vec] = m.evaluate(rem, cenv, cmemo)
        elif affine_deltas is not None:
            corr_vals = {}
            aff_point = tuple(self._dadd(v, d) for v, d in
                              zip(var_vals, affine_deltas))
            aenv = self._envm(data, aff_point, 0.0)
            benv = self._envm(data, var_vals, 0.0)
            amemo, bmemo, jmemo = {}, {}, {}
            for i, (vec, definition, comp) in enumerate(self.corrector):
                if not comp:
                    continue
                c_shift = m.evaluate(definition, aenv, amemo)
                c_base = m.evaluate(definition, benv, bmemo)
                lin = None
                for j, dj in enumerate(affine_deltas):
                    cell = self.full.lhs[i][j]
                    if cell is E.ZERO or dj.shape[-1] == 0:
                        continue
                    term = m.multiply_tv(m.evaluate(cell, env, jmemo),
                                         self._vec_tv(dj))
                    lin = term if lin is None else m.add_tv(lin, term)
                corr = m.add_tv(c_shift, m.negate_tv(c_base))
                if lin is not None:
                    corr = m.add_tv(corr, m.negate_tv(lin))
                corr_vals[vec] = corr

        for (vec, definition, comp) in self.corrector:
            val = m.evaluate(definition, renv, memo)
            if corr_vals is not None and vec in corr_vals:
                val = m.add_tv(val, corr_vals[vec])
            renv[vec] = val
        return renv

    def _search_direction(self, solve_fn, renv):
        """Solve the augmented system and back-substitute eliminated
        variables via the symbolic delta definitions.  The right-hand
        side and back-substitutions are evaluated in the residual
        pipeline's precision; the factorised solve stays in working
        precision."""
        m = self._cgm
        memo = {}
        if self.two_float:
            from . import codegen_df as cgdf
            parts = [m.as_vector(m.evaluate(r, renv, memo), sz)
                     for r, sz in zip(self.red.rhs, self.red_sizes)]
            if parts:
                bh = jnp.concatenate([p.hi for p in parts])
                bl = jnp.concatenate([p.lo for p in parts])
            else:
                bh = bl = jnp.zeros(0, self.dtype)
            solh, soll = solve_fn((bh, bl))
            deltas = [None] * len(self.full.variables)
            denv = dict(renv)
            offset = 0
            for var, sz in zip(self.red.variables, self.red_sizes):
                if sz:
                    vh = jax.lax.dynamic_slice_in_dim(solh, offset, sz)
                    vl = jax.lax.dynamic_slice_in_dim(soll, offset, sz)
                else:
                    vh = vl = jnp.zeros(0, self.dtype)
                offset += sz
                deltas[self.var_index[var]] = jnp.stack([vh, vl])
                denv[delta_variable(var)] = cgdf.DFTV("vector", vh, vl)
            memo2 = {}
            for dvar, ddef in reversed(self.red.delta_definitions):
                var = self.delta_to_var[dvar]
                tv = m.as_vector(m.evaluate(ddef, denv, memo2),
                                 self.size_of[var])
                denv[dvar] = cgdf.DFTV("vector", tv.hi, tv.lo)
                deltas[self.var_index[var]] = jnp.stack([tv.hi, tv.lo])
            return deltas
        parts = [m.as_vector_arr(m.evaluate(r, renv, memo), sz)
                 for r, sz in zip(self.red.rhs, self.red_sizes)]
        b = (jnp.concatenate(parts) if parts
             else jnp.zeros(0, self.dtype))
        sol = solve_fn(b)

        deltas = [None] * len(self.full.variables)
        denv = dict(renv)
        offset = 0
        for var, sz in zip(self.red.variables, self.red_sizes):
            val = jax.lax.dynamic_slice_in_dim(sol, offset, sz) \
                if sz else jnp.zeros(0, self.dtype)
            offset += sz
            deltas[self.var_index[var]] = val
            denv[delta_variable(var)] = m.vector(val)
        memo2 = {}
        for dvar, ddef in reversed(self.red.delta_definitions):
            var = self.delta_to_var[dvar]
            val = m.as_vector_arr(m.evaluate(ddef, denv, memo2),
                                  self.size_of[var])
            denv[dvar] = m.vector(val)
            deltas[self.var_index[var]] = val
        return deltas

    def _max_step(self, env, var_vals, deltas):
        dt = self.dtype
        alpha = jnp.asarray(1.0, dt)
        inf = jnp.asarray(jnp.inf, dt)
        for i in self.nonneg_idx:
            v, d = self._var_val(var_vals[i]), self._var_val(deltas[i])
            if v.shape[0] == 0:
                continue
            ratio = jnp.where(d < 0, -v / jnp.where(d < 0, d, -1.0), inf)
            alpha = jnp.minimum(alpha, jnp.min(ratio, initial=jnp.inf))
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
                v, d = self._var_val(var_vals[i]), \
                    self._var_val(deltas[i])
                if v.shape[0] == 0:
                    continue
                if lb_sym is not None:
                    lb = env[lb_sym].val
                    ratio = jnp.where(d < 0, (lb - v) / jnp.where(d < 0, d, -1.0), inf)
                    alpha = jnp.minimum(alpha, jnp.min(ratio, initial=jnp.inf))
                if ub_sym is not None:
                    ub = env[ub_sym].val
                    ratio = jnp.where(d > 0, (ub - v) / jnp.where(d > 0, d, 1.0), inf)
                    alpha = jnp.minimum(alpha, jnp.min(ratio, initial=jnp.inf))
        return alpha

    def _gondzio_round(self, env, data, var_vals, solve_fn, d, alpha,
                       mu_target, beta_min=0.1, beta_max=10.0,
                       delta_alpha=0.1, gamma=0.1):
        """One Gondzio centrality-corrector round (Gondzio 1996).

        At the enlarged trial step, complementarity products outside
        [beta_min, beta_max] * mu are pulled back to the nearest bound by
        an extra solve with the existing factors.  The corrected
        direction is kept only if it lengthens the step."""
        m = self._cgm
        dt = self.dtype
        alpha_t = jnp.minimum(alpha + delta_alpha, 1.0)
        trial = tuple(self._axpy(v, alpha_t, dv)
                      for v, dv in zip(var_vals, d))
        tenv = self._envm(data, trial, 0.0)

        # residual-vector bindings: comp rows get (p - clip(p)), others 0
        genv = dict(env)
        memo = {}
        mu_t = jnp.asarray(mu_target, dt)
        for i, (vec, definition, comp) in enumerate(self.corrector):
            sz = self.var_sizes[i]
            if comp and sz:
                p = m.as_vector_arr(m.evaluate(definition, tenv, memo), sz)
                target = jnp.clip(p, beta_min * mu_t, beta_max * mu_t)
                genv[vec] = m.vector(p - target)
            else:
                genv[vec] = m.vector(jnp.zeros(sz, dt))
        dm = self._search_direction(solve_fn, genv)

        d_new = tuple(self._dadd(dv, dmv) for dv, dmv in zip(d, dm))
        alpha_new = self._max_step(env, var_vals, d_new)
        accept = alpha_new >= jnp.minimum(alpha + gamma * delta_alpha, 1.0)
        d_out = tuple(jnp.where(accept, dn, dv)
                      for dn, dv in zip(d_new, d))
        return d_out, jnp.where(accept, alpha_new, alpha)
