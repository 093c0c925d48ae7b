"""Nested-dissection factorisation for general sparse KKT systems.

The framework's structured paths so far exploit two FIXED patterns:
block-tridiagonal (models/mpc.py, Riccati) and banded+arrow
(models/arrow.py, cyclic reduction).  This module closes SURVEY §5
scaling axis (c) for GENERAL sparsity: any symmetric quasi-definite KKT
matrix whose graph has small separators (grids, meshes, chains, trees,
circuit-like couplings) factors in far fewer flops than the dense
O(n^3) LDL^T, on a TPU-friendly schedule.

The reference has no sparse path at all — its elimination is symbolic
and dense (/root/reference/src/SymbolicOptimization.cpp:465-478 derives
reductions; LinearSolvers.cpp factors dense).  This is a TPU-native
redesign, not a port:

* The sparsity STRUCTURE is static (it comes from the problem's Q/A
  patterns), so all graph work — separator tree, elimination order,
  fill-in (symbolic factorisation), per-level padding — happens on the
  HOST at plan-build time (numpy).  The device program sees only static
  shapes and constant index arrays.
* Supernodes at the same elimination-tree height are independent, so
  each tree level runs as ONE batch of equal-padded dense blocks:
  a batched pivot-floored LDL^T of the (B, k, k) diagonal blocks, a
  batched triangular solve for the (B, k, m) boundary coupling, one
  einsum for the (B, m, m) Schur updates, and ONE scatter-add into the
  work matrix.  Sequential depth is O(log n) levels x ~5 XLA ops — not
  O(n) columns.
* Quasi-definite safety: the unpivoted LDL^T with a zero-pivot floor is
  stable for symmetric quasi-definite matrices under ANY symmetric
  permutation (Vanderbei 1995 — they are "strongly factorizable"), so
  the dissection ordering needs no numerical pivoting.

Padding convention: supernodes within a level are padded to the level's
max block/boundary size with a DUMMY variable index n (one extra
row/col).  Gathered blocks are masked back to identity on dummy slots,
and every scattered update is masked to zero there, so the dummy
row/col never contaminates live data.

The separator finder is a BFS level-set bisection from a
pseudo-peripheral vertex — cheap, exact on grids/bands/trees, and
merely suboptimal (never wrong) on expander-like graphs, which fall
back toward dense behaviour gracefully.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from .ldlt import PIVOT_FLOOR, batched_ldlt


# ---------------------------------------------------------------------------
# host-side plan construction (numpy only — runs once at trace time)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NDLevel:
    """One elimination-tree level: B supernodes padded to (k, m)."""
    idx: np.ndarray      # (B, k) int32 variable indices, dummy = n
    valid: np.ndarray    # (B, k) float mask, 1 on live slots
    bnd: np.ndarray      # (B, m) int32 boundary indices, dummy = n
    bvalid: np.ndarray   # (B, m) float mask


@dataclasses.dataclass(frozen=True)
class NDPlan:
    n: int
    levels: Tuple[NDLevel, ...]
    flops_nd: int        # sum over supernodes of k^3/3 + k^2 m + k m^2
    flops_dense: int     # n^3 / 3


#: Fixed per-level cost of the device program expressed in dense-flop
#: equivalents: each level pays gathers/scatters over the (n, n) work
#: matrix plus kernel dispatch regardless of its flop count, so a plan
#: with a huge flop ratio can still LOSE to dense when n is small
#: (measured r3: 2060x flop ratio, 0.2x actual).  Calibrate against the
#: measured crossover (tools/nd_probe.py); used by the auto-fallback.
ND_LEVEL_OVERHEAD_FLOPS = 2.0e7


def nd_predicted_speedup(plan: NDPlan) -> float:
    """Predicted step speedup of the plan vs the dense factorisation,
    from the flop counts plus the per-level fixed overhead.  > 1 means
    the plan is predicted to win; CompiledIPM's auto-fallback refuses
    plans below its threshold so a losing nd plan is never silently
    selected."""
    eff = plan.flops_nd + len(plan.levels) * ND_LEVEL_OVERHEAD_FLOPS
    return plan.flops_dense / max(eff, 1.0)


def _bfs_levels(adj: List[np.ndarray], start: int,
                members: np.ndarray) -> List[np.ndarray]:
    """BFS level sets of the subgraph induced by ``members`` (bool mask)."""
    seen = np.zeros(len(adj), bool)
    seen[~members] = True
    seen[start] = True
    frontier = [start]
    out = []
    while frontier:
        out.append(np.asarray(frontier, np.int64))
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if not seen[w]:
                    seen[w] = True
                    nxt.append(w)
        frontier = nxt
    return out


def _components(adj: List[np.ndarray], verts: np.ndarray) -> List[np.ndarray]:
    members = np.zeros(len(adj), bool)
    members[verts] = True
    comps = []
    for v in verts:
        if members[v]:
            levels = _bfs_levels(adj, int(v), members)
            comp = np.concatenate(levels)
            members[comp] = False
            comps.append(np.sort(comp))
    return comps


def _separate(adj: List[np.ndarray], verts: np.ndarray):
    """Split connected ``verts`` into (A, B, sep) by a BFS level-set cut
    from a pseudo-peripheral vertex.  Returns None if no useful cut
    exists (near-clique)."""
    members = np.zeros(len(adj), bool)
    members[verts] = True
    # pseudo-peripheral start: farthest vertex from an arbitrary one
    levels = _bfs_levels(adj, int(verts[0]), members)
    levels = _bfs_levels(adj, int(levels[-1][0]), members)
    if len(levels) < 3:
        return None
    sizes = np.array([len(l) for l in levels])
    total = sizes.sum()
    below = np.cumsum(sizes) - sizes  # vars strictly before level i
    # pick the separator level minimising the larger side
    worst = np.maximum(below, total - below - sizes)
    cand = np.arange(1, len(levels) - 1)
    ell = int(cand[np.argmin(worst[cand])])
    A = np.concatenate(levels[:ell])
    B = np.concatenate(levels[ell + 1:])
    sep = levels[ell]
    if len(A) == 0 or len(B) == 0 or len(sep) >= 0.5 * total:
        return None
    return np.sort(A), np.sort(B), np.sort(sep)


@dataclasses.dataclass
class _Node:
    vars: np.ndarray                 # this supernode's variables
    children: list                   # child _Nodes
    boundary: np.ndarray = None      # filled by _symbolic_factor
    height: int = 0


def _dissect(adj, verts: np.ndarray, leaf: int) -> List[_Node]:
    """Dissect ``verts`` into a forest of supernode trees (a forest when
    the induced subgraph is disconnected)."""
    comps = _components(adj, verts)
    nodes = []
    for comp in comps:
        if len(comp) <= leaf:
            nodes.append(_Node(vars=comp, children=[]))
            continue
        cut = _separate(adj, comp)
        if cut is None:
            nodes.append(_Node(vars=comp, children=[]))
            continue
        A, B, sep = cut
        children = _dissect(adj, A, leaf) + _dissect(adj, B, leaf)
        nodes.append(_Node(vars=sep, children=children))
    return nodes


def _symbolic_factor(adj, roots: List[_Node]) -> List[_Node]:
    """Compute each supernode's boundary (its row structure in the block
    factor, fill included) and height; return all supernodes."""
    out = []

    def visit(node, ancestors: np.ndarray):
        anc = np.zeros(len(adj), bool)
        anc[ancestors] = True
        own = np.zeros(len(adj), bool)
        own[node.vars] = True
        bset = np.zeros(len(adj), bool)
        h = 0
        child_anc = np.concatenate([ancestors, node.vars])
        for c in node.children:
            visit(c, child_anc)
            bset[c.boundary] = True
            h = max(h, c.height + 1)
        for v in node.vars:
            bset[adj[v]] = True
        # boundary = (direct neighbours ∪ child boundaries) that are
        # ancestors — everything else is inside the subtree (eliminated)
        node.boundary = np.flatnonzero(bset & anc)
        node.height = h
        out.append(node)

    for r in roots:
        visit(r, np.zeros((0,), np.int64))
    return out


def nd_plan(pattern: np.ndarray, leaf: int = 32, pad_to: int = 8) -> NDPlan:
    """Build the dissection plan for a symmetric sparsity ``pattern``
    ((n, n) bool; the diagonal is implicitly nonzero).

    ``leaf``: stop dissecting below this many variables.  ``pad_to``:
    round padded block sizes up to this multiple (sublane friendliness).
    """
    pattern = np.asarray(pattern)
    n = pattern.shape[0]
    sym = pattern | pattern.T
    np.fill_diagonal(sym, False)
    adj = [np.flatnonzero(sym[i]) for i in range(n)]

    roots = _dissect(adj, np.arange(n), leaf)
    nodes = [nd for nd in _symbolic_factor(adj, roots) if len(nd.vars)]

    # group by height; pad each level to its max (k, m)
    def rup(x, m):
        return max(-(-x // m) * m, m) if x else 0

    levels = []
    flops = 0
    maxh = max((nd.height for nd in nodes), default=0)
    for h in range(maxh + 1):
        group = [nd for nd in nodes if nd.height == h]
        if not group:
            continue
        k = rup(max(len(nd.vars) for nd in group), pad_to)
        m = rup(max(len(nd.boundary) for nd in group), pad_to)
        B = len(group)
        idx = np.full((B, k), n, np.int32)
        val = np.zeros((B, k), np.float64)
        bnd = np.full((B, max(m, 1)), n, np.int32)
        bval = np.zeros((B, max(m, 1)), np.float64)
        for i, nd in enumerate(group):
            kv, mv = len(nd.vars), len(nd.boundary)
            idx[i, :kv] = nd.vars
            val[i, :kv] = 1.0
            bnd[i, :mv] = nd.boundary
            bval[i, :mv] = 1.0
            flops += kv ** 3 // 3 + kv * kv * mv + kv * mv * mv
        levels.append(NDLevel(idx=idx, valid=val, bnd=bnd, bvalid=bval))
    return NDPlan(n=n, levels=tuple(levels), flops_nd=flops,
                  flops_dense=n ** 3 // 3)


# ---------------------------------------------------------------------------
# device-side factor / solve (jit-compatible; plan arrays are constants)
# ---------------------------------------------------------------------------


def _level_uses_pallas(method: str, k: int, dtype) -> bool:
    """Whether a level's batched factor/solves run as the VMEM-resident
    Pallas kernels (ops/pallas_ldlt.py).  'auto' = on TPU when a lane
    tile fits VMEM; the column-loop XLA lowering + vmapped
    TriangularSolve path they replace dominated the r3 measurement
    (nd_factor 18.2 ms vs 4.4 ms DENSE per iteration at n=4096: ~7
    levels x [k sequential tiny loop steps + serial triangular
    solves])."""
    if method == "jnp":
        return False
    if method == "pl":
        return True
    from .pallas_ldlt import _pl_fits
    return jax.default_backend() == "tpu" and _pl_fits(k, dtype)


def _factor_blocks(Kss, pivot_floor, method):
    if _level_uses_pallas(method, Kss.shape[-1], Kss.dtype):
        from .pallas_ldlt import batched_ldlt_pallas
        return batched_ldlt_pallas(Kss, pivot_floor)
    return batched_ldlt(Kss, pivot_floor)


def _solve_blocks(L, D, B, method="jnp"):
    """Batched multi-rhs LDL^T solve: (B,k,k) factors x (B,k,m)."""
    if B.shape[-1] and _level_uses_pallas(method, L.shape[-1], L.dtype):
        from .pallas_ldlt import batched_solve_ldlt_matrix_pallas
        return batched_solve_ldlt_matrix_pallas(L, D, B)

    def one(Li, Di, Bi):
        y = solve_triangular(Li, Bi, lower=True, unit_diagonal=True)
        z = y / Di[:, None]
        return solve_triangular(Li.T, z, lower=False, unit_diagonal=True)

    return jax.vmap(one)(L, D, B)


def _solve_vec_blocks(L, D, z, method="jnp"):
    """Batched single-rhs LDL^T solve: (B,k,k) factors x (B,k)."""
    if _level_uses_pallas(method, L.shape[-1], L.dtype):
        from .pallas_ldlt import batched_solve_ldlt_pallas
        return batched_solve_ldlt_pallas(L, D, z)
    return jax.vmap(_fwd_back)(L, D, z)


def nd_factor(K: jnp.ndarray, plan: NDPlan,
              pivot_floor: float = PIVOT_FLOOR, method: str = "auto"):
    """Block factorisation along the dissection plan.

    Returns per-level factors [(L, D, W)]: unit-lower/diagonal LDL^T of
    each (eliminated) diagonal block and W = Kss^{-1} Ksb, the block
    row of the factor.  Work matrix carries one dummy row/col (index n)
    absorbing padding.  ``method``: 'auto' (Pallas batched kernels on
    TPU, jnp elsewhere), 'pl', or 'jnp'."""
    n, dt = plan.n, K.dtype
    Kp = jnp.zeros((n + 1, n + 1), dt).at[:n, :n].set(K)
    out = []
    for lev in plan.levels:
        idx = jnp.asarray(lev.idx)
        v = jnp.asarray(lev.valid, dt)
        bnd = jnp.asarray(lev.bnd)
        bv = jnp.asarray(lev.bvalid, dt)
        B, k = lev.idx.shape
        Kss = Kp[idx[:, :, None], idx[:, None, :]]
        mask = v[:, :, None] * v[:, None, :]
        eye_pad = jnp.eye(k, dtype=dt)[None] * (1.0 - v)[:, :, None]
        Kss = Kss * mask + eye_pad
        L, D = _factor_blocks(Kss, pivot_floor, method)
        Ksb = Kp[idx[:, :, None], bnd[:, None, :]] * \
            (v[:, :, None] * bv[:, None, :])
        W = _solve_blocks(L, D, Ksb, method)
        S = jnp.einsum("bki,bkj->bij", Ksb, W)
        Kp = Kp.at[bnd[:, :, None], bnd[:, None, :]].add(-S)
        out.append((L, D, W))
    return out


def nd_solve(plan: NDPlan, factors, b: jnp.ndarray,
             method: str = "auto") -> jnp.ndarray:
    """Solve K x = b with :func:`nd_factor` factors."""
    dt = b.dtype
    n = plan.n
    bp = jnp.zeros((n + 1,), dt).at[:n].set(b)

    zs = []
    for lev, (L, D, W) in zip(plan.levels, factors):
        idx = jnp.asarray(lev.idx)
        v = jnp.asarray(lev.valid, dt)
        bnd = jnp.asarray(lev.bnd)
        bv = jnp.asarray(lev.bvalid, dt)
        z = bp[idx] * v
        zs.append(z)
        upd = jnp.einsum("bkm,bk->bm", W, z) * bv
        bp = bp.at[bnd].add(-upd)

    x = jnp.zeros((n + 1,), dt)
    for lev, (L, D, W), z in zip(reversed(plan.levels), reversed(factors),
                                 reversed(zs)):
        idx = jnp.asarray(lev.idx)
        v = jnp.asarray(lev.valid, dt)
        bnd = jnp.asarray(lev.bnd)
        y = _solve_vec_blocks(L, D, z, method)
        y = y - jnp.einsum("bkm,bm->bk", W, x[bnd])
        x = x.at[idx].set(y * v)
    return x[:n]


def _fwd_back(Li, Di, zi):
    y = solve_triangular(Li, zi, lower=True, unit_diagonal=True)
    return solve_triangular(Li.T, y / Di, lower=False, unit_diagonal=True)


def nd_solve_matrix(plan: NDPlan, factors, B: jnp.ndarray) -> jnp.ndarray:
    """Multi-rhs variant: B is (n, r).  The inner solves stay on the
    jnp path — vmapping over rhs columns would vmap the Pallas calls."""
    return jax.vmap(lambda col: nd_solve(plan, factors, col,
                                         method="jnp"),
                    in_axes=1, out_axes=1)(B)
