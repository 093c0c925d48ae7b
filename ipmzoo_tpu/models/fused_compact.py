"""Tail/compaction engines of :class:`.fused.FusedBatchedIPM`.

``FusedCompactMixin`` holds the hybrid solve entries built on top of the
fused whole-solve kernel: the restarted Gondzio anti-cycling tail, the
warm two-float escalation stage, and the compaction schedule of
``solve_fused_compact``.  Split out of models/fused.py (round 4) purely
for structure; behaviour is unchanged and pinned by tests/test_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .data import QPData
from .ipm import CompiledIPM


def _round_up(x, m):
    return -(-x // m) * m


class FusedCompactMixin:
    """Gondzio tail + escalation + compaction over the fused kernel."""

    # -- hybrid: fused core + restarted Gondzio tail ---------------------

    def _refined_impl(self, data: QPData, tail_cap: int, tail_iters: int,
                      tail_gondzio: int):
        out = self.solve_fused(data)
        return self._gondzio_tail(data, out, tail_cap, tail_iters,
                                  tail_gondzio)

    def _escalation_solver(self):
        """Two-float twin of this solver for the final escalation stage.

        Some instances hit a genuine f32 ITERATION floor just above the
        tolerance: measured on v5e at tol 1e-6, 1 instance in 10240
        finishes with duality gap 1.4e-14 but primal/dual residual
        1.07e-6 reported / 1.14e-6 in exact arithmetic — an f32-rounded
        iterate simply cannot represent a residual below
        ~eps_f32*||Qx|| for that data, in ANY number of f32 iterations
        (the Gondzio tail is powerless: this is representation, not
        cycling).  The two-float pipeline stores iterates as
        double-single pairs (models/codegen_df.py + ops/ldlt_df.py),
        which removes that floor (pinned to 1e-8 by
        tests/test_precision_floor.py)."""
        esc = getattr(self, "_esc_solver", None)
        if esc is None:
            esc = CompiledIPM(
                self.settings, self.n, self.m_ineq, self.m_eq,
                names=self.names, dtype=self.dtype, tol=self.tol,
                max_iter=self.max_iter, mu0=self.mu0, delta0=self.delta0,
                pivot_floor=self.pivot_floor,
                fraction_to_boundary=self.fraction_to_boundary,
                mu_floor=self.mu_floor, scale_tol=self.scale_tol,
                gondzio=self.gondzio, two_float=True)
            self._esc_solver = esc
        return esc

    def _escalate_tail(self, data: QPData, out, esc_cap: int,
                       esc_iters: int, esc_gondzio: int,
                       esc_warm: bool = True):
        """Re-solve the residual-stuck stragglers in two-float pairs.

        Runs inside the same jit as the fused stages.  When every
        instance already converged the masked while-loop exits at its
        first condition check, so the converged-batch cost is one
        vmapped metrics evaluation — the stage is effectively free
        unless it has work to do.

        ``esc_warm`` starts the pair solver FROM THE FUSED ITERATE
        (hi = f32 value, lo = 0): the instances this stage exists for
        are at the f32 representation floor — already essentially
        optimal, just unable to express a residual below
        ~eps_f32*||Qx|| — so warm pair refinement converges them in a
        couple of iterations where the cold restart re-ran the whole
        ~12-iteration solve in (~8x-cost) pair arithmetic.  Cold
        restart (esc_warm=False) remains for anti-cycling robustness;
        the XLA Gondzio safety-net tail after this stage cold-restarts
        anything still unconverged either way."""
        B = data.Q.shape[0]
        cap = min(esc_cap, B)
        esc = self._escalation_solver()
        take = jnp.argsort(out["converged"])[:cap]
        e_data = jax.tree_util.tree_map(lambda a: a[take], data)
        e_was = out["converged"][take]
        if esc_warm:
            from .ipm import IPMState
            offs = np.cumsum([0] + list(self.var_sizes))
            vals = tuple(
                jnp.stack([out["variables"][take][:, o:o + s],
                           jnp.zeros((cap, s), self.dtype)], axis=1)
                for o, s in zip(offs[:-1], self.var_sizes))

            def metrics_one(d, vs):
                return esc._metrics(esc._envm(d, vs, 0.0))

            residual, gap = jax.vmap(metrics_one)(e_data, vals)
            e_state = IPMState(
                vars=vals,
                mu=jnp.maximum(out["mu"][take],
                               jnp.asarray(esc.mu_floor, self.dtype)),
                iteration=jnp.zeros((cap,), jnp.int32),
                residual=residual, gap=gap)
        else:
            e_state = jax.vmap(esc.init_state)(e_data)
        e_tol = jnp.full((cap,), self.tol, self.dtype)
        e_state, e_div = esc._masked_while(
            e_state, e_data, e_was, e_tol, esc_iters,
            gondzio=esc_gondzio)
        e_conv = ((e_state.residual < e_tol) & (e_state.gap < self.tol)
                  & ~e_div)
        # round the (cap, 2, sz) double-single pairs back to working
        # precision for the merged outputs
        e_vars = jnp.concatenate(
            [v[:, 0] + v[:, 1] for v in e_state.vars], axis=-1)
        use = (~e_was) & e_conv

        def put(dst, src):
            upd = jnp.where(use.reshape((-1,) + (1,) * (src.ndim - 1)),
                            src, dst[take])
            return dst.at[take].set(upd)

        x_i = self.var_index[self.symbols.x]
        off = sum(self.var_sizes[:x_i])
        out["x"] = put(out["x"], e_vars[:, off:off + self.n])
        out["variables"] = put(out["variables"], e_vars)
        out["residual"] = put(out["residual"], e_state.residual)
        out["gap"] = put(out["gap"], e_state.gap)
        out["iterations"] = put(
            out["iterations"],
            out["iterations"][take] + e_state.iteration.astype(self.dtype))
        out["converged"] = put(out["converged"], e_conv)
        return out

    def _gondzio_tail(self, data: QPData, out, tail_cap: int,
                      tail_iters: int, tail_gondzio: int):
        B = data.Q.shape[0]
        cap = min(tail_cap, B)
        dt = self.dtype

        # gather the unconverged stragglers (actives first; converged
        # slots gathered as padding are re-solved harmlessly)
        take = jnp.argsort(out["converged"])[:cap]
        s_data = jax.tree_util.tree_map(lambda a: a[take], data)
        s_was_conv = out["converged"][take]

        # RESTART from the initial iterate: the fused core runs plain
        # Mehrotra, which cycles on ~1e-4 of instances (an attractor —
        # correcting mid-cycle stays trapped); Gondzio from a cold start
        # converges in ~11 iterations on the same instances (same
        # anti-cycling design as CompiledIPM.solve_batch_compact).
        s_state = jax.vmap(self.init_state)(s_data)
        from .ipm import IPMState
        s_state = IPMState(vars=s_state.vars, mu=s_state.mu,
                           iteration=out["iterations"][take].astype(
                               jnp.int32),
                           residual=s_state.residual, gap=s_state.gap)
        s_tol = jnp.full((cap,), self.tol, dt)
        # early-exit masked loop (shared with the XLA engines): instances
        # the fused core already converged are frozen from step 0 (they
        # were only gathered as static-shape padding); the loop ends when
        # every straggler converges or diverges — typically ~12 Gondzio
        # steps, not tail_iters.
        s_state, s_div = self._masked_while(
            s_state, s_data, s_was_conv, s_tol, tail_iters,
            gondzio=tail_gondzio)
        s_conv = ((s_state.residual < s_tol) & (s_state.gap < self.tol)
                  & ~s_div)
        s_vars = jnp.concatenate(s_state.vars, axis=-1) \
            if len(s_state.vars) > 1 else s_state.vars[0]

        # keep the tail result only where the fused core had failed and
        # the tail converged
        use = (~s_was_conv) & s_conv

        def put(dst, src):
            upd = jnp.where(use.reshape((-1,) + (1,) * (src.ndim - 1)),
                            src, dst[take])
            return dst.at[take].set(upd)

        x_i = self.var_index[self.symbols.x]
        off = sum(self.var_sizes[:x_i])
        out["x"] = put(out["x"], s_vars[:, off:off + self.n])
        out["variables"] = put(out["variables"], s_vars)
        out["residual"] = put(out["residual"], s_state.residual)
        out["gap"] = put(out["gap"], s_state.gap)
        out["iterations"] = put(out["iterations"],
                                s_state.iteration.astype(dt))
        out["converged"] = put(out["converged"], s_conv)
        return out

    def solve_fused_refined(self, data: QPData, tail_cap: int = 128,
                            tail_iters: int = 30, tail_gondzio: int = 2):
        """Fused whole-solve plus a compacted anti-cycling tail: the
        handful of instances plain Mehrotra cycles on are restarted
        under Gondzio correctors in one small batched solve, inside the
        same jit.  Converges the full batch at fused-engine speed."""
        B = data.Q.shape[0]
        if B % self.bt:
            # pad BEFORE the jit so the traced program is the aligned one
            data, = self._pad_batch(B, (data,))
            out = self.solve_fused_refined(data, tail_cap, tail_iters,
                                           tail_gondzio)
            return {k: v[:B] for k, v in out.items()}
        key = (tail_cap, tail_iters, tail_gondzio)
        cache = getattr(self, "_refined_cache", None)
        if cache is None:
            cache = self._refined_cache = {}
        if key not in cache:
            cache[key] = jax.jit(functools.partial(
                self._refined_impl, tail_cap=tail_cap,
                tail_iters=tail_iters, tail_gondzio=tail_gondzio))
        return cache[key](data)

    # -- compaction schedule over fused stages ---------------------------

    def _compact_fused_impl(self, data: QPData, schedule, tail_cap: int,
                            tail_iters: int, tail_gondzio: int,
                            fused_tail: bool = False, esc_cap: int = 0,
                            esc_iters: int = 40, esc_warm: bool = True):
        """Staged fused solve: run the full batch for a few iterations,
        then gather the unconverged stragglers into ever-smaller batches
        and RESUME them (warm-started kernel) with more budget.

        The whole-batch fused stage makes every tile pay for its slowest
        lane (~2.5x useful/executed iteration slack measured at
        max_iter=30); compaction confines that slack to a tile or two.
        Finishes with the anti-cycling stage: with ``fused_tail`` the
        stragglers are COLD-RESTARTED in one aligned fused tile running
        in-kernel Gondzio rounds (the XLA masked-while tail that follows
        then finds nothing left and exits immediately — it stays as the
        safety net); without it, the XLA Gondzio tail does the work."""
        B = data.Q.shape[0]
        (k0, div0), *rest = schedule
        assert div0 == 1, "first stage must cover the full batch"
        out = self.solve_fused(data, max_iter=k0)
        for (k, divisor) in rest:
            cap = _round_up(max(B // divisor, 1), min(self.bt, B))
            take = jnp.argsort(out["converged"])[:cap]
            s_data = jax.tree_util.tree_map(lambda a: a[take], data)
            s_state = {"variables": out["variables"][take],
                       "mu": out["mu"][take],
                       "iterations": out["iterations"][take]}
            s_out = self.solve_fused(s_data, state=s_state, max_iter=k)
            for f in ("x", "variables", "iterations", "residual", "gap",
                      "mu", "converged"):
                out[f] = out[f].at[take].set(s_out[f])
        # Full-batch mop-up: a resume stage whose active count exceeds
        # its 1/divisor capacity silently leaves instances unconverged
        # (observed at tol 1e-6: stage 1 converges ~6% fewer than at
        # 1e-5 and the 1/8 gather overflows).  Resuming the WHOLE batch
        # is cheap — a tile whose lanes are all converged exits its
        # while_loop at the first cond — and guarantees capacity
        # overflow never costs convergence.  Budget: an instance dropped
        # after stage 1 is still owed max_iter - k0 iterations.
        if rest and self.max_iter > k0:
            m_state = {"variables": out["variables"], "mu": out["mu"],
                       "iterations": out["iterations"]}
            out = self.solve_fused(data, state=m_state,
                                   max_iter=self.max_iter - k0)
        if fused_tail:
            # cap = one exact tile (B is always a bt multiple here, the
            # public entries pad first), so no padding happens inside
            # this traced region — the historical device-wedge config
            cap = min(self.bt, B)
            take = jnp.argsort(out["converged"])[:cap]
            s_data = jax.tree_util.tree_map(lambda a: a[take], data)
            s_was = out["converged"][take]
            s_out = self.solve_fused(s_data, max_iter=tail_iters,
                                     gondzio=tail_gondzio)
            s_out["iterations"] = s_out["iterations"] + \
                out["iterations"][take]
            use = (~s_was) & s_out["converged"]
            for f in ("x", "variables", "iterations", "residual", "gap",
                      "mu", "converged"):
                src = s_out[f]
                upd = jnp.where(
                    use.reshape((-1,) + (1,) * (src.ndim - 1)),
                    src, out[f][take])
                out[f] = out[f].at[take].set(upd)
        # Escalation BEFORE the XLA Gondzio safety net: the instances
        # left unconverged here are overwhelmingly f32-representation-
        # floor cases (the fused Gondzio stage above already cold-
        # restarted the cyclers), and a floor-stuck lane would churn
        # through all tail_iters f32 Gondzio steps without ever
        # converging — measured as most of the r3 tol-1e-6 headline
        # regression.  The Gondzio tail stays LAST as the safety net;
        # its early-exit masked while costs one gather + one vmapped
        # metrics evaluation when the escalation left nothing behind.
        if esc_cap:
            out = self._escalate_tail(data, out, esc_cap, esc_iters,
                                      tail_gondzio, esc_warm=esc_warm)
        out = self._gondzio_tail(data, out, tail_cap, tail_iters,
                                 tail_gondzio)
        return out

    def solve_fused_compact(self, data: QPData, schedule=None,
                            tail_cap: int = 128, tail_iters: int = 30,
                            tail_gondzio: int = 2,
                            fused_tail: bool = True, esc_cap: int = 32,
                            esc_iters: int = 40, esc_warm: bool = True):
        """Compaction-scheduled fused solve (see
        :meth:`_compact_fused_impl`).  Default schedule: most of the
        batch converges within ~9 iterations; stragglers resume in a
        1/8-size batch, then the in-kernel-Gondzio anti-cycling stage
        handles cyclers (``fused_tail=False`` falls back to the XLA
        masked-while tail for that)."""
        B = data.Q.shape[0]
        if B % self.bt:
            # pad BEFORE the jit so the traced program is the aligned one
            data, = self._pad_batch(B, (data,))
            out = self.solve_fused_compact(data, schedule, tail_cap,
                                           tail_iters, tail_gondzio,
                                           fused_tail, esc_cap, esc_iters,
                                           esc_warm)
            return {k: v[:B] for k, v in out.items()}
        if schedule is None:
            if B <= 2 * self.bt:
                schedule = [(self.max_iter, 1)]
            else:
                # stage 1 must converge >87.5% for the 1/8 stage-2 cap
                # to hold.  Measured iteration quantiles on the bench
                # workload: tol 1e-5 needs p87.5 = 8 iterations (k0=8
                # beat 7/9/10 on v5e at 100% convergence); tol 1e-6
                # needs p95 = 14 (at k0=8 NOTHING converges in stage 1
                # and the mop-up degenerates to a full-batch solve)
                k0 = min(self.max_iter, 8 if self.tol >= 1e-5 else 14)
                schedule = [(k0, 1),
                            (max(self.max_iter - k0, 1), 8)]
        key = (B, tuple(schedule), tail_cap, tail_iters, tail_gondzio,
               fused_tail, esc_cap, esc_iters, esc_warm)
        cache = getattr(self, "_compactf_cache", None)
        if cache is None:
            cache = self._compactf_cache = {}
        if key not in cache:
            cache[key] = jax.jit(functools.partial(
                self._compact_fused_impl, schedule=tuple(schedule),
                tail_cap=tail_cap, tail_iters=tail_iters,
                tail_gondzio=tail_gondzio, fused_tail=fused_tail,
                esc_cap=esc_cap, esc_iters=esc_iters,
                esc_warm=esc_warm))
        return cache[key](data)

