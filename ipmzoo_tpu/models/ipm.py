"""The compiled Mehrotra predictor-corrector IPM.

``CompiledIPM`` binds a symbolic formulation (Settings -> Newton system ->
augmented reduction, from :mod:`ipmzoo_tpu.formulations`) to concrete
problem sizes and stages the ENTIRE solve — KKT assembly, LDL^T
factorisation, predictor, fraction-to-boundary line search, Mehrotra
centering, corrector, step — into one ``lax.while_loop`` compiled by XLA.

Per-iteration structure (numerically equivalent to the reference driver,
/root/reference/src/NumericalOptimization/Optimizer.cpp:77-220, with the
interpreter walks replaced by trace-time staging):

  1. residual norm and duality measure of the full KKT residual at mu=0
  2. assemble the augmented KKT matrix; factor once (LDL^T, pivot floor)
  3. affine predictor: residual vectors at mu=0, solve, back-substitute
     eliminated variables via the symbolic delta definitions
  4. ratio test over nonnegative variables (+ explicit box tests for the
     Slacks formulations), trial step, mu_aff, sigma = (mu_aff/mu)^3
  5. corrector: complementarity residuals re-centred with sigma*mu and
     augmented by the affine correction Delta X_aff Delta S_aff e
     (derived symbolically at compile time), second solve with the SAME
     factorisation
  6. step all variables by 0.995 * alpha

Everything is a pure function of (state, data): vmap gives batched
multi-QP solving, shard_map distributes batches over a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formulations import (Settings, VariableNames, augmented_system,
                            build_symbols, delta_variable, newton_system,
                            normal_equations, shorthand_rhs)
from ..ops.ldlt import solve_ldlt
from ..symbolic import expr as E
from . import codegen as cg
from .data import QPData


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SolveResult:
    x: jnp.ndarray
    variables: dict          # name -> value for every KKT variable
    objective: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray
    gap: jnp.ndarray
    converged: jnp.ndarray
    diverged: jnp.ndarray    # numerical failure (NaN/inf) detected

    def tree_flatten(self):
        return ((self.x, self.variables, self.objective, self.iterations,
                 self.residual, self.gap, self.converged,
                 self.diverged), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IPMState:
    """Carry of the on-device iteration loop."""
    vars: tuple              # per-variable arrays, in system order
    mu: jnp.ndarray
    iteration: jnp.ndarray
    residual: jnp.ndarray
    gap: jnp.ndarray

    def tree_flatten(self):
        return ((self.vars, self.mu, self.iteration, self.residual,
                 self.gap), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


class CompiledIPM:
    """A formulation + problem-size specialised, fully staged IPM solver."""

    def __init__(self, settings: Settings, n: int, m_ineq: int = 0,
                 m_eq: int = 0, *, names: VariableNames = VariableNames(),
                 dtype=jnp.float64, tol: float = 1e-8, max_iter: int = 100,
                 fraction_to_boundary: float = 0.995, mu0: float = 1.0,
                 delta0: float = 1e-4, pivot_floor: float = 1e-8,
                 refine: int = 0, kernel: str = "auto",
                 scale_tol: bool = False, gondzio: int = 0,
                 mu_floor: float | str = "auto",
                 hybrid_refine: bool = False, df_residuals: bool = False,
                 two_float: bool = False, mesh=None,
                 mesh_axis: str = "tp", panel: Optional[int] = None,
                 nd_pattern=None, nd_leaf: int = 32,
                 taylor: str = "staged"):
        self.settings = settings
        self.n, self.m_ineq, self.m_eq = n, m_ineq, m_eq
        self.dtype = dtype
        self.tol = tol
        self.max_iter = max_iter
        self.fraction_to_boundary = fraction_to_boundary
        self.mu0 = mu0
        self.delta0 = delta0
        self.pivot_floor = pivot_floor
        #: extra iterative-refinement sweeps per linear solve (use 1-2 in
        #: float32 to recover near-f64 direction accuracy on TPU)
        self.refine = refine
        #: evaluate refinement residuals in two-float (double-single)
        #: compensated arithmetic (ops/twofloat.py) — mixed-precision
        #: refinement: f32 factorisation, ~2x-precision residual, so the
        #: refined direction reaches the f32 representation floor even on
        #: ill-conditioned systems.  No effect unless refine > 0.
        self.hybrid_refine = hybrid_refine
        #: stage the residual/metric pipeline in two-float pairs
        #: (models/codegen_df.py): residual rows near convergence are
        #: pure cancellation, so working-precision evaluation noise-
        #: floors them; pair evaluation keeps their RELATIVE error small,
        #: giving f64-grade Newton right-hand sides and convergence
        #: metrics from f32 TPU arithmetic.  Factorisations stay f32.
        #: run the ENTIRE solver pipeline in two-float (double-single)
        #: pairs: iterates are stored as (hi, lo) pairs (stacked (2, n)
        #: arrays), residuals/metrics/corrector run through codegen_df,
        #: and the augmented system is assembled AND FACTORED in pairs
        #: (ops/ldlt_df.py).  This removes both obstacles to 1e-8
        #: convergence in f32: the factorisation's eps*cond(K) limit
        #: (pair unit roundoff ~2^-48) and the iterate-representation
        #: floor (an f32-rounded iterate cannot have residual below
        #: ~eps_f32 * ||Q x||, so high-accuracy iterates must be pairs).
        #: Gives reference-parity tol 1e-8
        #: (/root/reference/src/NumericalOptimization/Optimizer.cpp:124,133)
        #: from pure f32 TPU arithmetic; see tests/test_precision_floor.py.
        self.two_float = two_float
        if two_float:
            if kernel not in ("auto", "ldlt"):
                raise ValueError(
                    "two_float=True factors in double-single pairs and "
                    "supports kernel='auto'/'ldlt' only")
            df_residuals = True
        self.df_residuals = df_residuals
        from . import codegen_df as cgdf_mod
        self._cgm = cgdf_mod if df_residuals else cg

        self._kernel_choice = kernel
        if kernel not in ("auto", "ldlt", "jnp", "block", "blockg", "lu",
                          "regldlt", "normal", "sharded", "nd"):
            raise ValueError(
                f"unknown kernel={kernel!r}; expected one of "
                "('auto', 'ldlt', 'jnp', 'block', 'blockg', 'lu', "
                "'regldlt', 'normal', 'sharded', 'nd')")
        if kernel == "normal" and df_residuals:
            raise NotImplementedError(
                "kernel='normal' pre-binds dense-matrix inverses in working "
                "precision; the two-float residual pipeline does not "
                "consume them — use the augmented-system kernels with "
                "df_residuals")
        #: number of Gondzio multiple-centrality-corrector rounds per
        #: iteration (0 = plain Mehrotra, matching the reference).  Each
        #: round reuses the factorisation to push complementarity
        #: products toward the central path and is accepted only if it
        #: lengthens the step.
        self.gondzio = gondzio
        #: lower bound on the centering parameter mu, tied to the working
        #: dtype.  Mehrotra's sigma=(mu_aff/mu)^3 can drive mu to (or
        #: below) the dtype's resolution in one step; in f32 the barrier
        #: diagonals ~lambda/s ~ lambda^2/mu then overflow inside the
        #: factorisation (products reach ~1/mu^2) and the step NaNs out,
        #: tripping the divergence rollback.  "auto" = eps(dtype)^2 * mu0
        #: (f32: ~1.4e-14, f64: ~4.9e-32): far below any realistic gap
        #: tolerance, but high enough that 1/mu^2 stays finite.
        if mu_floor == "auto":
            mu_floor = float(jnp.finfo(dtype).eps) ** 2 * mu0
        self.mu_floor = float(mu_floor)
        #: scale the residual test by (1 + initial residual norm) — the
        #: standard relative criterion for large problems, where an
        #: absolute norm test is dominated by dtype precision floors.
        #: (The reference uses absolute tolerances, suited to its tiny
        #: demo; gap stays absolute either way.)
        self.scale_tol = scale_tol

        o = build_symbols(names)
        self.symbols = o
        self.names = names

        # --- symbolic derivation (compile time) --------------------------
        full = newton_system(settings, names)
        sh = shorthand_rhs(full)
        reduced = full.copy()
        reduced.rhs = list(sh.shorthand_rhs)
        aug = augmented_system(reduced)
        self.full, self.sh, self.aug = full, sh, aug
        # The normal-equations reduction (one more elimination: the leading
        # Q/x block; reference derivation SymbolicOptimization.cpp:465-478,
        # stored by the reference Optimizer ctor at Optimizer.cpp:39-40 but
        # never consumed numerically there — here kernel='normal' solves it)
        self.norm = normal_equations(reduced) if kernel == "normal" else None

        # A symbolically zero diagonal block means the augmented system is
        # genuinely indefinite: unpivoted LDL^T is unsound there, so those
        # formulations route to a partial-pivoting LU factorisation (the
        # reference implementation simply hard-fails on them,
        # Optimizer.cpp:75).
        self._indefinite = any(aug.lhs[i][i] is E.ZERO
                               for i in range(len(aug.lhs)))
        if self._indefinite and kernel not in ("auto", "lu", "regldlt"):
            raise NotImplementedError(
                "augmented system has a symbolically zero diagonal block "
                "(indefinite); use kernel='regldlt' / 'lu' (or 'auto'), or "
                "a formulation with a quasi-definite augmented system")

        # --- sizes, offsets, index maps ----------------------------------
        size_of = {
            o.x: n, o.s_x_l: n, o.s_x_u: n, o.lambda_sxl: n, o.lambda_sxu: n,
            o.s_A_ineq: m_ineq, o.s_A_ineq_l: m_ineq, o.s_A_ineq_u: m_ineq,
            o.lambda_A_ineq: m_ineq, o.lambda_sAineql: m_ineq,
            o.lambda_sAinequ: m_ineq,
            o.s_A_eq: m_eq, o.s_A_eq_l: m_eq, o.s_A_eq_u: m_eq, o.p_eq: m_eq,
            o.lambda_A_eq: m_eq, o.lambda_sAeql: m_eq, o.lambda_sAequ: m_eq,
        }
        self.size_of = size_of
        self.var_sizes = [size_of[v] for v in full.variables]
        self.aug_sizes = [size_of[v] for v in aug.variables]
        self.aug_dim = sum(self.aug_sizes)
        self.var_index = {v: i for i, v in enumerate(full.variables)}

        # the reduction the linear solver actually consumes: the condensed
        # normal-equations system for kernel='normal', else the augmented
        self.red = self.norm if self.norm is not None else aug
        self.red_sizes = [size_of[v] for v in self.red.variables]
        self.red_dim = sum(self.red_sizes)
        # Dense-matrix inverses introduced by eliminating the leading Q/x
        # block (H^{-1} with H = aug.lhs[0][0]).  They appear in the
        # condensed cells, rhs and back-substitutions; the solver evaluates
        # each ONCE per iteration (LDL^T factor + solve against I) and
        # binds the value into the environment so every later evaluation
        # short-circuits — the same memoisation role the reference's
        # Environment plays (Evaluation.cpp:106-108).
        self._matrix_inverts = tuple(
            self._collect_matrix_inverts()) if self.norm is not None else ()

        # delta symbol -> original variable
        self.delta_to_var = {delta_variable(v): v for v in full.variables}
        # affine delta symbols (bind predictor direction for the corrector)
        self.affine_sym = {
            v: E.variable(delta_variable(v).name + "_affine")
            for v in full.variables}

        # complementarity rows: contain an e-vector and mu
        e_vecs = (o.e_var, o.e_ineq, o.e_eq)
        def is_comp(expr):
            return (any(expr.contains(ev) for ev in e_vecs) and
                    expr.contains(o.mu))
        self.comp_rows = [i for i, r in enumerate(full.rhs) if is_comp(r)]

        # Corrector: the reference substitutes affine-delta symbols for the
        # variables of each complementarity residual (Optimizer.cpp:183-209),
        # which is only the true second-order Mehrotra term when the row is
        # a pure product of variables (e.g. SlackedSlacks' G lambda - mu e).
        # For Slacks-handling rows like (X - L) lambda - mu e it injects a
        # spurious -L Delta-lambda term, and the reference stalls on its own
        # demo QP.  We instead stage the exact quadratic Taylor remainder
        #     corr_i = c_i(v + d_aff) - c_i(v) - J_i d_aff
        # which coincides with the reference's corrector on the rows where
        # that one is correct and fixes the rest (all rows are at most
        # quadratic, so the remainder is exact).
        self.corrector = [(vec, definition, is_comp(definition))
                          for vec, definition in sh.vector_definitions]
        # taylor="symbolic": the remainder above as a SIMPLIFIED
        # expression in the affine-delta symbols, staged once, instead
        # of the generic three-point numeric computation.  Exact at ANY
        # simplification level (the formula is the same polynomial
        # identity the numeric path computes), so this is a pure
        # evaluation-cost trade; opt-in until TPU-measured.
        if taylor not in ("staged", "symbolic"):
            raise ValueError(f"unknown taylor={taylor!r}; expected "
                             "'staged' or 'symbolic'")
        self.taylor = taylor
        self.corrector_rem = (self._build_symbolic_corrector()
                              if taylor == "symbolic" else None)

        # nonnegative variables (fraction-to-boundary set)
        nonneg = {o.s_A_ineq_l, o.s_A_ineq_u, o.s_x_l, o.s_x_u, o.s_A_eq_l,
                  o.s_A_eq_u, o.lambda_sAeql, o.lambda_sAequ,
                  o.lambda_sAineql, o.lambda_sAinequ, o.lambda_sxl,
                  o.lambda_sxu}
        self.nonneg_idx = [i for i, v in enumerate(full.variables)
                           if v in nonneg]

        # explicit box ratio tests apply when the bound slacks were not
        # introduced as variables (Slacks handling keeps l <= s <= u and
        # l_x <= x <= u_x explicit)
        var_set = set(full.variables)
        self.box_test = (o.s_A_ineq_l not in var_set and
                         o.s_A_ineq_u not in var_set)
        self.x_has_lb = settings.variable_bounds.has_lower
        self.x_has_ub = settings.variable_bounds.has_upper
        self.s_has_lb = settings.inequalities.has_lower
        self.s_has_ub = settings.inequalities.has_upper

        # objective expression (plain QP objective, no barrier terms)
        self.objective_expr = E.sum_expr([
            E.product([E.number(0.5), E.transpose(o.x), o.Q, o.x]),
            E.product([E.transpose(o.c), o.x])])

        # --- linear-solver mode -----------------------------------------
        # "ldlt": dense LDL^T; unbatched calls use the jnp kernel and
        #   vmapped (batched) calls dispatch to the VMEM-resident Pallas
        #   kernels via custom_vmap.
        # "jnp": dense LDL^T forced onto the pure-jnp blocked kernel (no
        #   Pallas dispatch) — the portable path, and the reference
        #   semantics the fused kernel is tested against.
        # "block": MXU-native block elimination (Cholesky + dense Schur)
        #   for 2x2 augmented structures — the fast path for large n.
        # "blockg": signed block-Cholesky over the symbolic group
        #   structure (ops/blockg.py) — G Cholesky stages + MXU trailing
        #   updates for ANY quasi-definite augmented system; diagonal
        #   signs are structural (+ primal groups, - dual groups,
        #   Vanderbei 1995).
        # "regldlt": signed-regularised LDL^T + iterative refinement for
        #   genuinely indefinite augmented systems (zero dual diagonal,
        #   e.g. EqualityHandling.NONE): add +delta I to primal rows and
        #   -delta I to dual rows (primal-dual proximal regularisation),
        #   making the system quasi-definite so the unpivoted (batched
        #   Pallas) LDL^T kernels apply, then refine against the TRUE
        #   unregularised matrix until the perturbation is gone.
        #   Auto-selected for indefinite systems: dynamic-pivoting LU is
        #   hostile to batched fixed-shape TPU execution.
        # "lu": partial-pivoting LU (XLA's generic kernel; the dynamic-
        #   pivoting reference choice, kept for parity/fallback).
        # "auto": block when the augmented system is 2x2 and the leading
        #   block is large enough for blocked Cholesky to win; blockg for
        #   other large quasi-definite structures.
        can_block = (len(self.aug.variables) == 2 and
                     self.aug.variables[0] is o.x)
        dual_groups = {o.lambda_A_ineq, o.lambda_sAineql, o.lambda_sAinequ,
                       o.lambda_A_eq, o.lambda_sAeql, o.lambda_sAequ,
                       o.lambda_sxl, o.lambda_sxu}
        self.group_signs = tuple(
            -1.0 if v in dual_groups else 1.0 for v in self.aug.variables)
        if two_float:
            # pair-assembled, pair-factored LDL^T; indefinite systems get
            # the same signed proximal regularisation as 'regldlt', with
            # pair-precision refinement against the true K
            self._mode = "tf"
        elif self._indefinite:
            self._mode = "lu" if kernel == "lu" else "regldlt"
        elif kernel == "lu":
            self._mode = "lu"
        elif kernel == "regldlt":
            self._mode = "regldlt"
        elif kernel == "sharded":
            # TP axis consumer: the ONE augmented KKT system is row-
            # sharded over the mesh and factored cooperatively by the
            # panel-sharded LDL^T (ops/sharded_ldlt.py) inside every
            # Mehrotra iteration — the end-to-end solve for QPs whose
            # KKT factorisation exceeds a single chip.  The system is
            # identity-padded to a multiple of (devices * panel): an
            # unpivoted LDL^T of blockdiag(K, I) factors the padding
            # trivially, so the solution is unchanged and any aug_dim
            # shards cleanly.
            if mesh is None:
                raise ValueError("kernel='sharded' requires mesh=")
            self._mesh, self._mesh_axis = mesh, mesh_axis
            ndev = mesh.shape[mesh_axis]
            rpd0 = max(self.aug_dim // ndev, 1)
            p = panel if panel is not None else min(128, rpd0)
            chunk = ndev * p
            self._sharded_panel = p
            self._sharded_dim = ((self.aug_dim + chunk - 1)
                                 // chunk) * chunk
            self._mode = "sharded"
        elif kernel == "nd":
            # General-sparsity path: nested-dissection block elimination
            # of the augmented KKT (ops/ndiss.py).  The dissection plan
            # (separator tree, elimination order, fill, padding) is built
            # on the HOST from the KKT sparsity pattern; the device
            # program is O(log n) levels of batched dense block ops.
            # The pattern is static problem structure: pass it as
            # nd_pattern, or leave None and the first solve derives it
            # from the data (assembling one KKT eagerly).
            self._mode = "nd"
            self._nd_leaf = nd_leaf
            if nd_pattern is not None:
                from ..ops.ndiss import nd_plan
                self._nd_plan = nd_plan(np.asarray(nd_pattern),
                                        leaf=nd_leaf)
            else:
                self._nd_plan = None
        elif kernel == "block":
            if not can_block:
                raise ValueError("kernel='block' needs a 2x2 augmented "
                                 "system with x in the leading block")
            self._mode = "block"
        elif kernel == "blockg":
            self._mode = "blockg"
        elif kernel == "normal":
            self._mode = "normal"
        elif kernel == "auto" and can_block and n >= 384:
            self._mode = "block"
        elif kernel == "auto" and self.aug_dim >= 384:
            self._mode = "blockg"
        else:
            self._mode = "ldlt"
        if self._mode in ("ldlt", "regldlt") and \
                kernel in ("auto", "ldlt", "regldlt") and pivot_floor == 1e-8:
            from ..ops.pallas_ldlt import ldlt_auto, solve_ldlt_auto
            self._factor = ldlt_auto
            self._solve_kernel = solve_ldlt_auto
        else:
            from ..ops.blocked_ldlt import ldlt_blocked
            self._factor = lambda K: ldlt_blocked(K, self.pivot_floor)
            self._solve_kernel = solve_ldlt

        # signed row regularisation for the regldlt mode: +1 on primal
        # groups, -1 on dual groups (same structural signs blockg uses)
        self._sign_vec = np.concatenate(
            [np.full(s, sign, dtype=np.float64)
             for s, sign in zip(self.aug_sizes, self.group_signs)]
        ) if self.aug_sizes else np.zeros((0,))

        # jitted entry points
        self._solve_jit = jax.jit(self._solve_impl)
        self._step_jit = jax.jit(self._step_impl)

    # ------------------------------------------------------------------
    # normal-equations support
    # ------------------------------------------------------------------

    def _collect_matrix_inverts(self):
        """All distinct Invert subexpressions over dense-matrix operands
        in the condensed system (lhs cells, rhs, delta definitions).

        Eliminating the leading Q/x block introduces H^{-1} with
        H = aug.lhs[0][0] (a Sum containing the symmetric matrix Q);
        elementwise inversion is unsound for those, so the solver binds a
        factored inverse per iteration instead."""
        K = E.Kind
        seen, out = set(), []
        hm_memo = {}

        def has_matrix(e):
            # memoised: the expression DAG is hash-consed with heavy
            # sharing, so unmemoised recursion is exponential
            hit = hm_memo.get(e)
            if hit is not None:
                return hit
            r = (e.kind in (K.MATRIX, K.SYMMETRIC_MATRIX) or
                 any(has_matrix(c) for c in e.children))
            hm_memo[e] = r
            return r

        def walk(e):
            if e in seen:
                return
            seen.add(e)
            if E.is_invert(e) and has_matrix(e.child):
                out.append(e)
            for c in e.children:
                walk(c)

        for row in self.red.lhs:
            for cell in row:
                walk(cell)
        for r in self.red.rhs:
            walk(r)
        for _, d in self.red.delta_definitions:
            walk(d)
        return out

    def _bind_matrix_inverts(self, env: cg.Env) -> None:
        """Evaluate each dense-matrix inverse once (LDL^T with the pivot
        floor + solve against I) and bind it into ``env`` IN PLACE, so
        every later evaluation of the condensed system short-circuits on
        the env hit.  The explicit inverse turns all downstream condensed
        algebra (A H^{-1} A^T, H^{-1} r) into plain matmuls — the
        MXU-friendly staging of the classical normal-equations recipe."""
        from ..ops.blocked_ldlt import ldlt_blocked
        for ie in self._matrix_inverts:
            if ie in env:
                continue
            child = cg.evaluate(ie.child, env, {})
            if child.tag != "matrix":
                env[ie] = cg.invert_tv(child)
                continue
            H = child.val
            L, D = ldlt_blocked(H, self.pivot_floor)
            eye = jnp.eye(H.shape[0], dtype=H.dtype)
            env[ie] = cg.matrix(solve_ldlt(L, D, eye))

    # ------------------------------------------------------------------
    # environment plumbing
    # ------------------------------------------------------------------

    def _base_env(self, data: QPData, mu_val) -> cg.Env:
        o = self.symbols
        dt = self.dtype
        ones = functools.partial(jnp.ones, dtype=dt)
        return {
            o.Q: cg.matrix(data.Q.astype(dt)),
            o.c: cg.vector(data.c.astype(dt)),
            o.A_ineq: cg.matrix(data.A_ineq.astype(dt)),
            o.l_A_ineq: cg.vector(data.l_A_ineq.astype(dt)),
            o.u_A_ineq: cg.vector(data.u_A_ineq.astype(dt)),
            o.A_eq: cg.matrix(data.A_eq.astype(dt)),
            o.b_eq: cg.vector(data.b_eq.astype(dt)),
            o.l_x: cg.vector(data.l_x.astype(dt)),
            o.u_x: cg.vector(data.u_x.astype(dt)),
            o.delta_eq: cg.scalar(jnp.asarray(self.delta0, dt)),
            o.mu: cg.scalar(jnp.asarray(mu_val, dt)),
            o.e_var: cg.vector(ones(self.n)),
            o.e_ineq: cg.vector(ones(self.m_ineq)),
            o.e_eq: cg.vector(ones(self.m_eq)),
        }

    def _env(self, data: QPData, var_vals, mu_val) -> cg.Env:
        if self.two_float:
            # the problem data is exact in working precision (lo = 0);
            # the ITERATE carries genuine low words
            from . import codegen_df as cgdf
            env = cgdf.lift_env(self._base_env(data, mu_val))
            for var, val in zip(self.full.variables, var_vals):
                env[var] = cgdf.DFTV("vector", val[0], val[1])
            return env
        env = self._base_env(data, mu_val)
        for var, val in zip(self.full.variables, var_vals):
            env[var] = cg.vector(val)
        return env

    def _lift(self, env: cg.Env):
        """Promote a working-precision env for the residual pipeline."""
        if not self.df_residuals or self.two_float:
            return env  # two-float envs are built lifted
        from . import codegen_df as cgdf
        return cgdf.lift_env(env)

    def _envm(self, data: QPData, var_vals, mu_val):
        return self._lift(self._env(data, var_vals, mu_val))

    # --- two-float state helpers --------------------------------------
    # State variables are plain (n,) arrays normally, stacked (2, n)
    # (hi, lo) pairs under two_float.  These helpers keep the step/loop
    # logic mode-agnostic.

    def _var_val(self, v):
        """Rounded working-precision value of a state variable/delta."""
        return (v[0] + v[1]) if self.two_float else v

    def _vec_tv(self, d):
        """Bind a state-variable array as a codegen value."""
        if self.two_float:
            from . import codegen_df as cgdf
            return cgdf.DFTV("vector", d[0], d[1])
        return self._cgm.vector(d)

    def _axpy(self, v, a, d):
        """v + a * d (pair-exact under two_float; a is a plain scalar)."""
        if not self.two_float:
            return v + a * d
        from ..ops.twofloat import df_add, df_mul
        ah = jnp.asarray(a, self.dtype)
        zero = jnp.zeros_like(ah)
        s = df_add((v[0], v[1]), df_mul((ah, zero), (d[0], d[1])))
        return jnp.stack(s)

    def _dadd(self, a, b):
        """a + b on state-variable arrays (pair-renormalising)."""
        if not self.two_float:
            return a + b
        from ..ops.twofloat import df_add
        return jnp.stack(df_add((a[0], a[1]), (b[0], b[1])))

    # ------------------------------------------------------------------
    # staged computations
    # ------------------------------------------------------------------

    def _metrics(self, env0):
        """(residual norm, duality gap) of the full system at mu=0.

        ``env0`` is a working-precision env, or a lifted two-float env
        when ``df_residuals`` (then norms are compensated too)."""
        m = self._cgm
        memo = {}
        dt = self.dtype
        if sum(self.var_sizes) == 0:
            return jnp.asarray(0.0, dt), jnp.asarray(0.0, dt)
        vals = [m.as_vector(m.evaluate(r, env0, memo), sz)
                for r, sz in zip(self.full.rhs, self.var_sizes)]
        comp_size = sum(self.var_sizes[i] for i in self.comp_rows)
        if self.df_residuals:
            from . import codegen_df as cgdf
            residual = cgdf.norm2([v.pair for v in vals]).astype(dt)
            if comp_size == 0:
                gap = jnp.asarray(0.0, dt)
            else:
                gap = (cgdf.abs_sum([vals[i].pair
                                     for i in self.comp_rows]) /
                       comp_size).astype(dt)
            return residual, gap
        r = jnp.concatenate([v for v in vals]) if vals else jnp.zeros(0, dt)
        residual = jnp.sqrt(jnp.dot(r, r))
        comp = [vals[i] for i in self.comp_rows]
        if comp_size == 0:
            gap = jnp.asarray(0.0, dt)
        else:
            gap = jnp.sum(jnp.abs(jnp.concatenate(comp))) / comp_size
        return residual, gap

    def _gap_only(self, env0):
        """Duality measure alone (evaluates only the complementarity
        rows — used for mu_aff at the affine trial point, where the full
        residual is not needed)."""
        m = self._cgm
        dt = self.dtype
        comp_size = sum(self.var_sizes[i] for i in self.comp_rows)
        if comp_size == 0:
            return jnp.asarray(0.0, dt)
        memo = {}
        if self.df_residuals:
            from . import codegen_df as cgdf
            pairs = [m.as_vector(m.evaluate(self.full.rhs[i], env0, memo),
                                 self.var_sizes[i]).pair
                     for i in self.comp_rows]
            return (cgdf.abs_sum(pairs) / comp_size).astype(dt)
        acc = jnp.asarray(0.0, dt)
        for i in self.comp_rows:
            v = cg.as_vector(cg.evaluate(self.full.rhs[i], env0, memo),
                             self.var_sizes[i])
            if v.shape[0]:
                acc = acc + jnp.sum(jnp.abs(v))
        return acc / comp_size

    def _assemble_blocks(self, env):
        """Evaluate each cell of the consumed reduction (augmented system,
        or the condensed normal equations for kernel='normal') as a dense
        block."""
        memo = {}
        blocks = []
        for i, vi in enumerate(self.red.variables):
            si = self.red_sizes[i]
            row_blocks = []
            for j, vj in enumerate(self.red.variables):
                sj = self.red_sizes[j]
                cell = self.red.lhs[i][j]
                if cell is E.ZERO:
                    row_blocks.append(jnp.zeros((si, sj), self.dtype))
                else:
                    row_blocks.append(
                        cg.as_block(cg.evaluate(cell, env, memo), si, sj))
            blocks.append(row_blocks)
        return blocks

    def _assemble_kkt(self, env):
        blocks = self._assemble_blocks(env)
        rows = [jnp.concatenate(rb, axis=1) if len(rb) > 1 else rb[0]
                for rb in blocks]
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def _assemble_kkt_df(self, env):
        """Two-float assembly of the consumed reduction: every cell is
        evaluated as an (hi, lo) pair (codegen_df) so barrier diagonals
        like lambda/s carry pair-relative accuracy into the
        factorisation."""
        from . import codegen_df as cgdf
        memo = {}
        rows_h, rows_l = [], []
        for i, vi in enumerate(self.red.variables):
            si = self.red_sizes[i]
            rbh, rbl = [], []
            for j, vj in enumerate(self.red.variables):
                sj = self.red_sizes[j]
                cell = self.red.lhs[i][j]
                if cell is E.ZERO:
                    z = jnp.zeros((si, sj), self.dtype)
                    rbh.append(z)
                    rbl.append(z)
                else:
                    bh, bl = cgdf.as_block(
                        cgdf.evaluate(cell, env, memo), si, sj)
                    rbh.append(bh)
                    rbl.append(bl)
            rows_h.append(jnp.concatenate(rbh, axis=1)
                          if len(rbh) > 1 else rbh[0])
            rows_l.append(jnp.concatenate(rbl, axis=1)
                          if len(rbl) > 1 else rbl[0])
        Kh = jnp.concatenate(rows_h, axis=0) if len(rows_h) > 1 \
            else rows_h[0]
        Kl = jnp.concatenate(rows_l, axis=0) if len(rows_l) > 1 \
            else rows_l[0]
        return Kh, Kl

    def _residual_fn(self, K):
        """b - K sol for refinement: plain, or two-float compensated."""
        if self.hybrid_refine:
            from ..ops.twofloat import comp_residual
            return lambda b, sol: comp_residual(b, K, sol)
        return lambda b, sol: b - K @ sol

    def _make_solve(self, env):
        """Factor the augmented KKT once; return solve(b) -> sol with
        optional iterative refinement baked in."""
        if self._mode == "tf":
            # double-single assembly + factorisation; solve consumes and
            # returns (hi, lo) PAIRS.  Indefinite systems get the signed
            # proximal regularisation of 'regldlt' (the pair analogue:
            # delta ~ eps_pair^(2/3)) with pair refinement against the
            # true K removing the perturbation.
            from ..ops.ldlt_df import ldlt_df, solve_ldlt_df
            from ..ops.twofloat import df_add, df_matvec, df_neg
            Kh, Kl = self._assemble_kkt_df(env)
            if self._indefinite:
                eps_pair = 2.0 ** -48
                scale = jnp.maximum(
                    jnp.asarray(1.0, self.dtype),
                    jnp.max(jnp.abs(jnp.diagonal(Kh))))
                delta = jnp.asarray(eps_pair ** (2.0 / 3.0),
                                    self.dtype) * scale
                signs = jnp.asarray(self._sign_vec, self.dtype)
                pert = jnp.diag(delta * signs)
                Frh, Frl = df_add((Kh, Kl), (pert, jnp.zeros_like(pert)))
                nref = max(self.refine, 3)
            else:
                Frh, Frl = Kh, Kl
                nref = self.refine
            Lh, Ll, Dh, Dl = ldlt_df(Frh, Frl, self.pivot_floor)

            def solve(b):
                bh, bl = b
                if bh.shape[0] == 0:
                    return b
                sol = solve_ldlt_df(Lh, Ll, Dh, Dl, bh, bl)
                for _ in range(nref):
                    r = df_add((bh, bl),
                               df_neg(df_matvec((Kh, Kl), sol)))
                    c = solve_ldlt_df(Lh, Ll, Dh, Dl, r[0], r[1])
                    sol = df_add(sol, c)
                return sol

            return solve

        if self._mode == "sharded":
            from ..ops.sharded_ldlt import sharded_ldlt, sharded_ldlt_solve
            K = self._assemble_kkt(env)
            dim, pdim = self.red_dim, self._sharded_dim
            if pdim != dim:
                Kp = jnp.eye(pdim, dtype=self.dtype).at[:dim, :dim].set(K)
            else:
                Kp = K
            factors = sharded_ldlt(Kp, self._mesh, axis=self._mesh_axis,
                                   panel=self._sharded_panel,
                                   pivot_floor=self.pivot_floor)
            resid = self._residual_fn(K)

            def _one(r):
                rp = (jnp.zeros((pdim,), self.dtype).at[:dim].set(r)
                      if pdim != dim else r)
                sol = sharded_ldlt_solve(factors, rp, self._mesh,
                                         axis=self._mesh_axis,
                                         panel=self._sharded_panel)
                return sol[:dim]

            def solve(b):
                if b.shape[0] == 0:
                    return b
                sol = _one(b)
                for _ in range(self.refine):
                    sol = sol + _one(resid(b, sol))
                return sol

            return solve

        if self._mode == "lu":
            from jax.scipy.linalg import lu_factor, lu_solve
            K = self._assemble_kkt(env)
            factors = lu_factor(K)
            resid = self._residual_fn(K)

            def solve(b):
                if b.shape[0] == 0:
                    return b
                sol = lu_solve(factors, b)
                for _ in range(self.refine):
                    sol = sol + lu_solve(factors, resid(b, sol))
                return sol

            return solve

        if self._mode == "regldlt":
            # signed proximal regularisation K + delta * diag(signs):
            # the perturbed system is quasi-definite (Vanderbei 1995), so
            # the unpivoted batched LDL^T kernels are sound; refinement
            # against the TRUE K removes the O(delta) perturbation.  The
            # contraction factor per sweep is ~delta*||K^{-1}||*scale, so
            # eps^{2/3} reaches the dtype floor in <= 3 sweeps for
            # moderately conditioned systems.
            K = self._assemble_kkt(env)
            eps = float(jnp.finfo(self.dtype).eps)
            scale = jnp.maximum(jnp.asarray(1.0, self.dtype),
                                jnp.max(jnp.abs(jnp.diagonal(K))))
            delta = jnp.asarray(eps ** (2.0 / 3.0), self.dtype) * scale
            signs = jnp.asarray(self._sign_vec, self.dtype)
            Kr = K + jnp.diag(delta * signs)
            L, D = self._factor(Kr)
            resid = self._residual_fn(K)
            nref = max(self.refine, 3)

            def solve(b):
                if b.shape[0] == 0:
                    return b
                sol = self._solve_kernel(L, D, b)
                for _ in range(nref):
                    sol = sol + self._solve_kernel(L, D, resid(b, sol))
                return sol

            return solve

        if self._mode == "blockg":
            from ..ops.blockg import (blockg_factor, blockg_matvec,
                                      blockg_solve)
            blocks = self._assemble_blocks(env)
            factors = blockg_factor(blocks, self.group_signs)
            offs = []
            off = 0
            for s in self.aug_sizes:
                offs.append(off)
                off += s

            if self.hybrid_refine and self.refine:
                resid = self._residual_fn(self._assemble_kkt(env))
            else:
                def resid(b, sol):
                    parts = [sol[o:o + s]
                             for o, s in zip(offs, self.aug_sizes)]
                    return b - jnp.concatenate(
                        blockg_matvec(blocks, parts))

            def solve(b):
                if b.shape[0] == 0:
                    return b
                sol = blockg_solve(factors, b)
                for _ in range(self.refine):
                    sol = sol + blockg_solve(factors, resid(b, sol))
                return sol

            return solve

        if self._mode == "block":
            from ..ops.block_solve import (block2_factor, block2_matvec,
                                           block2_solve)
            blocks = self._assemble_blocks(env)
            H, BT = blocks[0][0], blocks[0][1]
            B, negC = blocks[1][0], blocks[1][1]
            C = -negC
            factors = block2_factor(H, B, C)
            n1 = self.aug_sizes[0]
            if self.hybrid_refine and self.refine:
                resid = self._residual_fn(self._assemble_kkt(env))
            else:
                def resid(b, sol):
                    e1, e2 = block2_matvec(H, B, C, sol[:n1], sol[n1:])
                    return b - jnp.concatenate([e1, e2])

            def solve(b):
                dx, dy = block2_solve(factors, b[:n1], b[n1:])
                sol = jnp.concatenate([dx, dy])
                for _ in range(self.refine):
                    r = resid(b, sol)
                    cx, cy = block2_solve(factors, r[:n1], r[n1:])
                    sol = sol + jnp.concatenate([cx, cy])
                return sol

            return solve

        if self._mode == "nd":
            from ..ops.ndiss import nd_factor, nd_solve
            if self._nd_plan is None:
                raise RuntimeError(
                    "kernel='nd' has no dissection plan; pass nd_pattern= "
                    "to the constructor or call solve()/solve_batch() "
                    "(which derive it from the data) before step()")
            K = self._assemble_kkt(env)
            factors = nd_factor(K, self._nd_plan, self.pivot_floor)
            resid = self._residual_fn(K)
            plan = self._nd_plan

            def solve(b):
                if b.shape[0] == 0:
                    return b
                sol = nd_solve(plan, factors, b)
                for _ in range(self.refine):
                    sol = sol + nd_solve(plan, factors, resid(b, sol))
                return sol

            return solve

        if self._mode == "normal":
            # bind H^{-1} first (mutates env: the residual/corrector envs
            # derive from this env by dict copy, so the binding propagates
            # to every rhs / delta-definition evaluation this iteration)
            self._bind_matrix_inverts(env)

        K = self._assemble_kkt(env)
        L, D = self._factor(K)
        resid = self._residual_fn(K)

        def solve(b):
            if b.shape[0] == 0:
                return b
            sol = self._solve_kernel(L, D, b)
            for _ in range(self.refine):
                sol = sol + self._solve_kernel(L, D, resid(b, sol))
            return sol

        return solve

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

    # ------------------------------------------------------------------
    # iteration / loop
    # ------------------------------------------------------------------

    def init_state(self, data: QPData,
                   warm_start: Optional[dict] = None) -> IPMState:
        """Build the initial iterate: bound midpoints for x and s, ones
        elsewhere (the reference's initialisation).  ``warm_start`` maps
        variable names (e.g. ``"x"``) to starting values — for MPC-style
        receding-horizon resolves, pass the previous solution's
        ``SolveResult.variables``; interior variables are nudged off
        their bounds for strict feasibility."""
        dt = self.dtype
        o = self.symbols
        init = {
            o.x: 0.5 * (data.l_x + data.u_x).astype(dt),
            o.s_A_ineq: 0.5 * (data.l_A_ineq + data.u_A_ineq).astype(dt),
        }
        nonneg = {self.full.variables[i] for i in self.nonneg_idx}
        vals = []
        for v, sz in zip(self.full.variables, self.var_sizes):
            if warm_start is not None and v.name in warm_start:
                w = jnp.asarray(warm_start[v.name], dt)
                if v in nonneg:
                    # keep strictly interior
                    w = jnp.maximum(w, 1e-2)
                vals.append(w)
            else:
                vals.append(init.get(v, jnp.ones(sz, dt)))
        if self.two_float:
            vals = [jnp.stack([v, jnp.zeros_like(v)]) for v in vals]
        env0 = self._envm(data, vals, 0.0)
        residual, gap = self._metrics(env0)
        return IPMState(vars=tuple(vals), mu=jnp.asarray(self.mu0, dt),
                        iteration=jnp.asarray(0, jnp.int32),
                        residual=residual, gap=gap)

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

    def _step_impl(self, state: IPMState, data: QPData,
                   gondzio: Optional[int] = None) -> IPMState:
        env = self._env(data, state.vars, state.mu)
        envm = self._lift(env)
        gap = state.gap

        # factor the augmented KKT once (always working precision)
        solve_fn = self._make_solve(env)

        # affine predictor (mu = 0)
        renv = self._residual_env(envm, 0.0)
        d_aff = self._search_direction(solve_fn, renv)
        alpha_aff = self._max_step(env, state.vars, d_aff)

        # trial step -> mu_aff -> sigma
        trial = tuple(self._axpy(v, alpha_aff, d)
                      for v, d in zip(state.vars, d_aff))
        tenv = self._envm(data, trial, 0.0)
        gap_aff = self._gap_only(tenv)
        dt = self.dtype
        safe_gap = jnp.where(gap > 0, gap, 1.0)
        sigma = jnp.where(gap > 0, (gap_aff / safe_gap) ** 3, 0.0)
        mu_new = jnp.maximum(gap * sigma,
                             jnp.asarray(self.mu_floor, dt)).astype(dt)

        # corrector with recentred complementarity + affine correction
        cenv = self._residual_env(envm, mu_new, data=data,
                                  var_vals=state.vars, affine_deltas=d_aff)
        d_cc = self._search_direction(solve_fn, cenv)
        alpha = self._max_step(env, state.vars, d_cc)

        # Gondzio multiple centrality correctors: push trial-point
        # complementarity products into [beta_min, beta_max] * mu with
        # extra solves against the SAME factorisation; accept a round
        # only if it lengthens the step.
        n_gondzio = self.gondzio if gondzio is None else gondzio
        for _ in range(n_gondzio):
            d_cc, alpha = self._gondzio_round(envm, data, state.vars,
                                              solve_fn, d_cc, alpha,
                                              mu_new)

        step = self.fraction_to_boundary * alpha
        new_vars = tuple(self._axpy(v, step, d)
                         for v, d in zip(state.vars, d_cc))

        nenv = self._envm(data, new_vars, 0.0)
        residual, new_gap = self._metrics(nenv)
        return IPMState(vars=new_vars, mu=mu_new,
                        iteration=state.iteration + 1,
                        residual=residual, gap=new_gap)

    def _solve_impl(self, data: QPData,
                    warm_start: Optional[dict] = None) -> SolveResult:
        state0 = self.init_state(data, warm_start)
        if self.scale_tol:
            res_tol = self.tol * (1.0 + state0.residual)
        else:
            res_tol = jnp.asarray(self.tol, self.dtype)
        tol = self.tol

        def _bad(s):
            return jnp.isnan(s.residual) | jnp.isinf(s.residual) | \
                jnp.isnan(s.gap)

        def cond(carry):
            state, diverged = carry
            done = (state.residual < res_tol) & (state.gap < tol)
            return (~done) & (~diverged) & \
                (state.iteration < self.max_iter)

        def body(carry):
            state, _ = carry
            new = self._step_impl(state, data)
            bad = _bad(new)
            # divergence rollback: a numerically failed step (e.g. an
            # f32 factorisation overflowing once mu underflows) returns
            # the LAST GOOD iterate instead of NaN garbage
            keep = jax.tree_util.tree_map(
                lambda o, n_: jnp.where(bad, o, n_), state, new)
            return (keep, bad)

        state, step_diverged = jax.lax.while_loop(
            cond, body, (state0, jnp.asarray(False)))
        env = self._env(data, state.vars, state.mu)
        f = self._cgm.evaluate(self.objective_expr, env).val \
            if self.two_float else cg.evaluate(self.objective_expr,
                                               env).val
        x = self._var_val(state.vars[self.var_index[self.symbols.x]])
        return SolveResult(
            x=x,
            variables={v.name: self._var_val(val) for v, val in
                       zip(self.full.variables, state.vars)},
            objective=f,
            iterations=state.iteration,
            residual=state.residual,
            gap=state.gap,
            converged=(state.residual < res_tol) & (state.gap < tol),
            diverged=step_diverged | _bad(state),
        )

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _ensure_nd_plan(self, data: QPData) -> None:
        """Derive the nested-dissection plan from the data's sparsity
        (kernel='nd' with no explicit nd_pattern): assemble ONE KKT
        matrix eagerly at the initial iterate and dissect its nonzero
        pattern.  Barrier terms only touch diagonal blocks, so the
        pattern is iteration-invariant; the plan is cached and baked
        into the jitted solve as constants."""
        if self._mode != "nd" or self._nd_plan is not None:
            return
        from ..ops.ndiss import nd_plan
        if jnp.asarray(data.Q).ndim == 3:      # batched: structure from
            data = jax.tree_util.tree_map(lambda a: a[0], data)  # inst. 0
        state = self.init_state(data)
        env = self._env(data, state.vars, jnp.asarray(self.mu0, self.dtype))
        K = np.asarray(self._assemble_kkt(env))
        self._nd_plan = nd_plan(K != 0, leaf=self._nd_leaf)

    def solve(self, data: QPData,
              warm_start: Optional[dict] = None) -> SolveResult:
        """Solve one QP instance (jitted; first call compiles).

        ``warm_start``: optional dict of variable name -> initial value
        (e.g. a previous ``SolveResult.variables``)."""
        self._ensure_nd_plan(data)
        if warm_start is None:
            return self._solve_jit(data)
        if not hasattr(self, "_solve_warm_jit"):
            self._solve_warm_jit = jax.jit(self._solve_impl)
        return self._solve_warm_jit(data, warm_start)

    def step(self, state: IPMState, data: QPData) -> IPMState:
        """One jitted IPM iteration (for benchmarking / inspection)."""
        return self._step_jit(state, data)

    def solve_batch(self, data: QPData) -> SolveResult:
        """Solve a batch of QPs (leading batch axis on every leaf)."""
        self._ensure_nd_plan(data)
        if not hasattr(self, "_solve_batch_jit"):
            self._solve_batch_jit = jax.jit(jax.vmap(self._solve_impl))
        return self._solve_batch_jit(data)

    # ------------------------------------------------------------------
    # compacted batch solve (straggler-free full solves)
    # ------------------------------------------------------------------

    def _masked_steps(self, state, data, diverged, res_tol, k: int,
                      gondzio: Optional[int] = None):
        """Run ``k`` vmapped iterations; converged/diverged instances are
        frozen (their state re-enters unchanged) and a step that goes
        NaN/inf rolls back to the last good iterate, as in
        :meth:`_solve_impl`."""
        stepv = jax.vmap(
            functools.partial(self._step_impl, gondzio=gondzio))

        def mask_like(m, leaf):
            return m.reshape(m.shape + (1,) * (leaf.ndim - 1))

        def body(_, carry):
            st, div = carry
            done = (st.residual < res_tol) & (st.gap < self.tol)
            frozen = done | div
            new = stepv(st, data)
            bad = (jnp.isnan(new.residual) | jnp.isinf(new.residual) |
                   jnp.isnan(new.gap) | jnp.isinf(new.gap))
            keep = frozen | bad
            merged = jax.tree_util.tree_map(
                lambda o, n_: jnp.where(mask_like(keep, n_), o, n_),
                st, new)
            return merged, div | (bad & ~frozen)

        return jax.lax.fori_loop(0, k, body, (state, diverged))

    def _masked_while(self, state, data, frozen0, res_tol, max_steps: int,
                      gondzio: Optional[int] = None):
        """Early-exit variant of :meth:`_masked_steps`: iterates until
        every instance is frozen (converged, diverged, or externally
        frozen via ``frozen0``) or ``max_steps`` is reached.  Same
        freeze/NaN-rollback semantics."""
        stepv = jax.vmap(
            functools.partial(self._step_impl, gondzio=gondzio))

        def mask_like(m, leaf):
            return m.reshape(m.shape + (1,) * (leaf.ndim - 1))

        def done(st):
            return (st.residual < res_tol) & (st.gap < self.tol)

        def cond(carry):
            st, div, it = carry
            frozen = frozen0 | done(st) | div
            return jnp.logical_and(it < max_steps, ~jnp.all(frozen))

        def body(carry):
            st, div, it = carry
            frozen = frozen0 | done(st) | div
            new = stepv(st, data)
            bad = (jnp.isnan(new.residual) | jnp.isinf(new.residual) |
                   jnp.isnan(new.gap) | jnp.isinf(new.gap))
            keep = frozen | bad
            merged = jax.tree_util.tree_map(
                lambda o, n_: jnp.where(mask_like(keep, n_), o, n_),
                st, new)
            return merged, div | (bad & ~frozen), it + 1

        state, diverged, _ = jax.lax.while_loop(
            cond, body,
            (state, jnp.zeros(res_tol.shape, bool),
             jnp.asarray(0, jnp.int32)))
        return state, diverged

    def _compact_impl(self, data: QPData, schedule, tail_gondzio,
                      tail_restart):
        """Whole-batch solve with device-side compaction between stages.

        A vmapped ``while_loop`` makes every instance pay for the
        slowest one: a single straggler keeps all ``B`` lanes stepping
        (frozen lanes still execute) to ``max_iter``.  Instead, run a
        fixed number of masked steps on the full batch, then argsort the
        done-mask (actives first), gather the leading ``B // divisor``
        slots — a static shape — and continue on that sub-batch only,
        scattering results back.  Typical workloads converge >99% of
        instances in the first stage, so the tail costs ~1/divisor of a
        full-batch step.  Instances that exceed a stage's capacity stay
        where they are and simply report unconverged — no wrong answers,
        and the convergence rate surfaces the event.

        Tail stages RESTART still-active instances from the initial
        iterate and run with ``tail_gondzio`` Gondzio centrality-
        corrector rounds: plain Mehrotra CYCLES on a small fraction of
        instances (observed: residual oscillation on a well-conditioned
        box QP, in f64 too — an algorithmic failure mode, not a
        precision one).  The cycle is an attractor — switching on
        Gondzio mid-cycle stays trapped — but Gondzio from a cold start
        converges in ~11 iterations on the same instance, so the tail
        re-initialises.  Cumulative per-instance iteration counts are
        preserved for honest throughput accounting.  Running Gondzio
        only on the compacted tail keeps the full-batch stage at
        plain-Mehrotra cost."""
        B = data.Q.shape[0]
        state = jax.vmap(self.init_state)(data)
        dt = self.dtype
        if self.scale_tol:
            res_tol = self.tol * (1.0 + state.residual)
        else:
            res_tol = jnp.full((B,), self.tol, dt)
        diverged = jnp.zeros((B,), bool)

        (k0, div0), *rest = schedule
        assert div0 == 1, "first stage must cover the full batch"
        state, diverged = self._masked_steps(state, data, diverged,
                                             res_tol, k0)

        for (k, divisor) in rest:
            cap = max(B // divisor, 1)
            done = (state.residual < res_tol) & (state.gap < self.tol)
            frozen = done | diverged
            # gather priority: actives first, then diverged (which get
            # their Gondzio second chance), converged last as padding
            priority = 2 * done.astype(jnp.int32) + \
                (diverged & ~done).astype(jnp.int32)
            take = jnp.argsort(priority)[:cap]
            sub = jax.tree_util.tree_map(lambda a: a[take],
                                         (state, data, diverged, res_tol))
            s_state, s_data, s_div, s_tol = sub
            # restart unconverged instances (active OR diverged — the
            # latter get a second chance under Gondzio) from the initial
            # iterate (a Mehrotra cycle is an attractor; see docstring),
            # keeping their cumulative iteration count; converged slots
            # gathered as padding keep their state
            if tail_restart:
                s_done = ((s_state.residual < s_tol) &
                          (s_state.gap < self.tol))
                fresh = jax.vmap(self.init_state)(s_data)
                fresh = IPMState(vars=fresh.vars, mu=fresh.mu,
                                 iteration=s_state.iteration,
                                 residual=fresh.residual, gap=fresh.gap)
                s_state = jax.tree_util.tree_map(
                    lambda o, n_: jnp.where(
                        s_done.reshape(s_done.shape +
                                       (1,) * (n_.ndim - 1)), o, n_),
                    s_state, fresh)
                s_div = jnp.where(s_done, s_div, False)
            s_state, s_div = self._masked_steps(s_state, s_data, s_div,
                                                s_tol, k,
                                                gondzio=tail_gondzio)
            state = jax.tree_util.tree_map(
                lambda f, s: f.at[take].set(s), state, s_state)
            diverged = diverged.at[take].set(s_div)

        # Full-batch mop-up: a stage whose active count exceeds its
        # 1/divisor capacity silently leaves instances unconverged (the
        # gather drops them on the floor) — observed at tol 1e-6, where
        # stage 1 converges ~6% fewer instances than at 1e-5 and the
        # 1/8 cap overflows.  The early-exit masked while costs one
        # cond evaluation when everything already converged, and
        # full-batch steps only for as long as any instance is active,
        # so the compact engine is never worse-converging than
        # solve_batch.  Budget: an instance dropped after stage 1 is
        # still owed max_iter - k0 iterations; per-instance totals can
        # therefore exceed max_iter, like the restart tails' cumulative
        # counts.  Gondzio rounds ride along (free when no lane is
        # active) so a capacity-dropped cycler at least gets the
        # corrector, though without the cold restart the tails provide.
        done = (state.residual < res_tol) & (state.gap < self.tol)
        state, mop_div = self._masked_while(
            state, data, done | diverged, res_tol,
            max(self.max_iter - schedule[0][0], 0), gondzio=tail_gondzio)
        diverged = diverged | mop_div

        def finish(st, d, rtol, div):
            env = self._env(d, st.vars, st.mu)
            f = self._cgm.evaluate(self.objective_expr, env).val \
                if self.two_float else cg.evaluate(self.objective_expr,
                                                   env).val
            return SolveResult(
                x=self._var_val(st.vars[self.var_index[self.symbols.x]]),
                variables={v.name: self._var_val(val) for v, val in
                           zip(self.full.variables, st.vars)},
                objective=f,
                iterations=st.iteration,
                residual=st.residual,
                gap=st.gap,
                converged=(st.residual < rtol) & (st.gap < self.tol),
                diverged=div)

        return jax.vmap(finish)(state, data, res_tol, diverged)

    def solve_batch_compact(self, data: QPData, schedule=None,
                            tail_gondzio: int = 2,
                            tail_restart: bool = True) -> SolveResult:
        """Straggler-free batched solve (see :meth:`_compact_impl`).

        ``schedule``: list of ``(steps, batch_divisor)`` stages; the
        first divisor must be 1.  The default spends 12 iterations on
        the full batch, 12 more on the slowest eighth, and the remaining
        iteration budget on the slowest 1/64th.  ``tail_gondzio``:
        Gondzio corrector rounds for the tail stages (anti-cycling)."""
        self._ensure_nd_plan(data)
        B = data.Q.shape[0]
        if schedule is None:
            if B < 64:
                schedule = [(self.max_iter, 1)]
            else:
                # stage 1 must converge >87.5% of the batch or the 1/8
                # stage-2 cap overflows into the (full-batch-cost)
                # mop-up: measured p87.5 on the bench workload is 8
                # iterations at tol 1e-5 but 13-14 at 1e-6
                k0 = min(self.max_iter, 12 if self.tol >= 1e-5 else 14)
                k1 = min(max(self.max_iter - k0, 0), 12)
                k2 = max(self.max_iter - k0 - k1, 0)
                schedule = [(k0, 1)]
                if k1:
                    schedule.append((k1, 8))
                if k2:
                    schedule.append((k2, 64))
        key = (B, tuple(schedule), tail_gondzio, tail_restart)
        cache = getattr(self, "_compact_cache", None)
        if cache is None:
            cache = self._compact_cache = {}
        if key not in cache:
            cache[key] = jax.jit(
                functools.partial(self._compact_impl,
                                  schedule=tuple(schedule),
                                  tail_gondzio=tail_gondzio,
                                  tail_restart=tail_restart))
        return cache[key](data)
