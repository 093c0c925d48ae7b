"""Pallas TPU kernels: batched VMEM-resident LDL^T factor and solve.

Motivation: the XLA lowering of the column-loop LDL^T keeps the batch of
KKT matrices HBM-resident across the n sequential steps — every step
re-streams the whole (B, n, n) buffer, costing ~n full-batch HBM sweeps.
These kernels tile the *batch* axis instead: a tile of instances is DMA'd
to VMEM once, the entire factorisation runs on-chip (each scalar step of
the sequential algorithm becomes a lane-wide vector op across instances),
and the factors are written back once.  HBM traffic drops from O(n) to
O(1) sweeps of the batch.

Layout: structure-of-arrays ``(n, n, B)`` — the batch is the lane
dimension (128 lanes), matrix rows are sublanes.  Wrappers accept the
standard ``(B, n, n)`` layout and transpose at the boundary (one cheap
XLA transpose per call).

The public entry points are ``custom_vmap``-wrapped single-instance
functions: an unbatched call falls back to the jnp kernel in
:mod:`.ldlt`; under ``jax.vmap`` (e.g. inside the batched IPM solver)
the Pallas batched kernels take over.  On non-TPU backends the kernels
run in interpreter mode, so tests exercise the same code path on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ldlt import PIVOT_FLOOR, ldlt, solve_ldlt

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_bt(npad: int, Bpad: int, dtype=jnp.float32) -> int:
    """Batch-tile size: as large as VMEM comfortably allows.

    Measured on v5e (n=32): bt=128 is badly issue-bound, bt=512 reaches
    ~6 TFLOP/s f32.  Budget ~10 MB for the A-in + L-out blocks."""
    budget = 10 * 1024 * 1024
    itemsize = jnp.dtype(dtype).itemsize
    per_instance = npad * npad * itemsize * 2 + npad * itemsize * 2
    bt = budget // max(per_instance, 1)
    bt = max(LANE, min(512, (bt // LANE) * LANE))
    return min(bt, Bpad)


def _pl_fits(n: int, dtype=jnp.float32) -> bool:
    """Whether one LANE-wide batch tile of the factor kernel fits VMEM.

    The SoA layout puts the batch on the lane axis, so the minimum
    useful tile is 128 instances: at large n that alone blows the
    ~16 MB scoped VMEM limit (measured: aug_dim 352 demands a 60.5 MB
    window and the whole solve crashes at compile).  Batched calls
    beyond this size route to the XLA blocked kernel instead.  The
    element size comes from ``dtype`` — with x64 enabled an f64 batch
    doubles the VMEM estimate, halving the dim range the kernel takes."""
    npad = max(_round_up(n, 8), 8)
    itemsize = jnp.dtype(dtype).itemsize
    per_instance = npad * npad * itemsize * 2 + npad * itemsize * 2
    return per_instance * LANE <= 14 * 1024 * 1024


# ---------------------------------------------------------------------------
# factor kernel: A_t (n, n, BT) -> L_t (strict lower + unit diag), D_t (n, BT)
# ---------------------------------------------------------------------------

def _factor_kernel(n: int, pivot_floor: float, a_ref, l_ref, d_ref):
    npad = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)

    def body2(j, carry):
        mask_k = (row_ids < j).astype(a_ref.dtype)          # (npad, 1)
        lj = l_ref[j, :, :] * mask_k                        # (npad, BT) row j
        w = lj * d_ref[:, :]                                # (npad, BT)
        # s_i = sum_k L[i, k] * w[k] — expressed as a VPU multiply-reduce
        # (a batched-dot dot_general does not lower in Mosaic here)
        s = jnp.sum(l_ref[:, :, :] * w[None, :, :], axis=1)
        d = a_ref[j, j, :] - jnp.sum(lj * w, axis=0)        # (BT,)
        d = jnp.where(d == 0, jnp.asarray(pivot_floor, a_ref.dtype), d)
        col = (a_ref[:, j, :] - s) / d[None, :]             # (npad, BT)
        col = jnp.where(row_ids > j, col, 0.0)
        l_ref[:, j, :] = col
        l_ref[j, j, :] = jnp.ones_like(d)
        d_ref[j, :] = d
        return carry

    l_ref[:, :, :] = jnp.zeros_like(l_ref)
    d_ref[:, :] = jnp.ones_like(d_ref)
    jax.lax.fori_loop(0, n, body2, 0)


def _batched_factor_t(A_t: jnp.ndarray, n: int, pivot_floor: float,
                      bt: int = LANE):
    """A_t: (npad, npad, Bpad) -> (L_t, D_t) in the same layout."""
    npad, _, Bpad = A_t.shape
    grid = (Bpad // bt,)
    kernel = functools.partial(_factor_kernel, n, pivot_floor)
    L_t, D_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((npad, npad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((npad, npad, bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((npad, bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((npad, npad, Bpad), A_t.dtype),
                   jax.ShapeDtypeStruct((npad, Bpad), A_t.dtype)),
        interpret=_interpret(),
    )(A_t)
    return L_t, D_t


# ---------------------------------------------------------------------------
# solve kernel: L_t (n,n,BT), D_t (n,BT), b_t (n,BT) -> x_t (n,BT)
# ---------------------------------------------------------------------------

def _solve_kernel(n: int, l_ref, d_ref, b_ref, x_ref):
    npad = l_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)

    # forward substitution: y_i = b_i - sum_{k<i} L[i,k] y_k
    def fwd(i, _):
        mask = (row_ids < i).astype(x_ref.dtype)
        li = l_ref[i, :, :]                                  # (npad, BT)
        s = jnp.sum(li * x_ref[:, :] * mask, axis=0)         # (BT,)
        x_ref[i, :] = b_ref[i, :] - s
        return _

    x_ref[:, :] = b_ref[:, :]
    jax.lax.fori_loop(0, n, fwd, 0)

    # diagonal
    x_ref[:, :] = x_ref[:, :] / d_ref[:, :]

    # backward: x_i = z_i - sum_{k>i} L[k,i] x_k
    def bwd(t, _):
        i = n - 1 - t
        mask = (row_ids > i).astype(x_ref.dtype)
        col = l_ref[:, i, :]                                 # (npad, BT)
        s = jnp.sum(col * x_ref[:, :] * mask, axis=0)
        x_ref[i, :] = x_ref[i, :] - s
        return _

    jax.lax.fori_loop(0, n, bwd, 0)


def _batched_solve_t(L_t, D_t, b_t, n: int, bt: int = LANE):
    npad, _, Bpad = L_t.shape
    grid = (Bpad // bt,)
    kernel = functools.partial(_solve_kernel, n)
    x_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((npad, npad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((npad, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((npad, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((npad, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, Bpad), L_t.dtype),
        interpret=_interpret(),
    )(L_t, D_t, b_t)
    return x_t


# ---------------------------------------------------------------------------
# multi-rhs solve kernel: L_t (n,n,BT), D_t (n,BT), B_t (n,K,BT) -> (n,K,BT)
# ---------------------------------------------------------------------------

def _solve_matrix_kernel(n: int, l_ref, d_ref, b_ref, x_ref):
    """Exact-width unrolled triangular sweeps over a (npad, K, BT) rhs
    block — the K right-hand sides of every lane-instance solve together
    (one factor read instead of K).  n is static, so the column loop is
    a Python loop with static slices (same pattern as the fused
    engine's in-kernel solve, models/fused.py)."""
    x_ref[...] = b_ref[...]
    # forward: x[j+1:] -= L[j+1:, j] * x[j]
    for j in range(n - 1):
        x_ref[j + 1:n, :, :] = x_ref[j + 1:n, :, :] - \
            l_ref[j + 1:n, j, :][:, None, :] * x_ref[j, :, :][None, :, :]
    x_ref[...] = x_ref[...] / d_ref[...][:, None, :]
    # backward: x[i] -= sum_{k>i} L[k, i] * x[k]
    for i in range(n - 2, -1, -1):
        s = jnp.sum(l_ref[i + 1:n, i, :][:, None, :] * x_ref[i + 1:n, :, :],
                    axis=0)
        x_ref[i, :, :] = x_ref[i, :, :] - s


def _batched_solve_matrix_t(L_t, D_t, B_t, n: int, bt: int = LANE):
    npad, _, Bpad = L_t.shape
    kpad = B_t.shape[1]
    grid = (Bpad // bt,)
    kernel = functools.partial(_solve_matrix_kernel, n)
    x_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((npad, npad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((npad, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((npad, kpad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((npad, kpad, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, kpad, Bpad), L_t.dtype),
        interpret=_interpret(),
    )(L_t, D_t, B_t)
    return x_t


def _factor_solve_matrix_kernel(n: int, pivot_floor: float, a_ref, b_ref,
                                l_ref, d_ref, x_ref):
    """Fused factor + multi-rhs solve: one kernel launch, the factors
    never round-trip through HBM between factor and solve."""
    _factor_kernel(n, pivot_floor, a_ref, l_ref, d_ref)
    _solve_matrix_kernel(n, l_ref, d_ref, b_ref, x_ref)


def batched_ldlt_solve_matrix_pallas(A: jnp.ndarray, R: jnp.ndarray,
                                     pivot_floor: float = PIVOT_FLOOR):
    """Fused batched factor+solve: A (B, n, n), R (B, n, k) ->
    (L, D, X) with L D L^T X_b = R_b — one Pallas launch per batch tile
    (the separate factor-then-solve path pays a second launch and a
    factor write+read through HBM)."""
    B, n, _ = A.shape
    k = R.shape[-1]
    if n == 0:
        return jnp.zeros_like(A), jnp.zeros((B, 0), A.dtype), R
    if k == 0:
        L, D = batched_ldlt_pallas(A, pivot_floor)
        return L, D, R
    npad = max(_round_up(n, 8), 8)
    kpad = max(_round_up(k, 8), 8)
    itemsize = jnp.dtype(A.dtype).itemsize
    budget = 10 * 1024 * 1024
    per_instance = (2 * npad * npad + 2 * npad * kpad + npad) * itemsize
    bt0 = max(LANE, min(512, (budget // per_instance // LANE) * LANE))
    bt0 = min(bt0, _round_up(max(B, 1), LANE))
    Bpad = _round_up(max(B, 1), bt0)
    A_t = jnp.pad(jnp.transpose(A, (1, 2, 0)),
                  ((0, npad - n), (0, npad - n), (0, Bpad - B)))
    R_t = jnp.pad(jnp.transpose(R, (1, 2, 0)),
                  ((0, npad - n), (0, kpad - k), (0, Bpad - B)))
    grid = (Bpad // bt0,)
    kernel = functools.partial(_factor_solve_matrix_kernel, n,
                               pivot_floor)
    L_t, D_t, x_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((npad, npad, bt0), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((npad, kpad, bt0), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((npad, npad, bt0), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((npad, bt0), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((npad, kpad, bt0), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((npad, npad, Bpad), A.dtype),
                   jax.ShapeDtypeStruct((npad, Bpad), A.dtype),
                   jax.ShapeDtypeStruct((npad, kpad, Bpad), A.dtype)),
        interpret=_interpret(),
    )(A_t, R_t)
    L = jnp.transpose(L_t, (2, 0, 1))[:B, :n, :n]
    D = jnp.transpose(D_t, (1, 0))[:B, :n]
    X = jnp.transpose(x_t, (2, 0, 1))[:B, :n, :k]
    return L, D, X


def batched_solve_ldlt_matrix_pallas(L: jnp.ndarray, D: jnp.ndarray,
                                     R: jnp.ndarray) -> jnp.ndarray:
    """Multi-rhs batched solve: L (B, n, n), D (B, n), R (B, n, k) ->
    X (B, n, k) with L D L^T X_b = R_b per instance."""
    B, n, _ = L.shape
    k = R.shape[-1]
    if n == 0 or k == 0:
        return R
    npad = max(_round_up(n, 8), 8)
    kpad = max(_round_up(k, 8), 8)
    # VMEM budget includes the (npad, kpad, bt) rhs+solution blocks
    itemsize = jnp.dtype(L.dtype).itemsize
    budget = 10 * 1024 * 1024
    per_instance = (npad * npad + 2 * npad * kpad + npad) * itemsize
    bt0 = max(LANE, min(512, (budget // per_instance // LANE) * LANE))
    # never tile wider than the (lane-rounded) batch: a bt0 > B pads the
    # whole grid to one oversized tile of mostly dead lanes
    bt0 = min(bt0, _round_up(max(B, 1), LANE))
    Bpad = _round_up(max(B, 1), bt0)
    L_t = jnp.pad(jnp.transpose(L, (1, 2, 0)),
                  ((0, npad - n), (0, npad - n), (0, Bpad - B)))
    D_t = jnp.pad(jnp.transpose(D, (1, 0)), ((0, npad - n), (0, Bpad - B)),
                  constant_values=1.0)
    R_t = jnp.pad(jnp.transpose(R, (1, 2, 0)),
                  ((0, npad - n), (0, kpad - k), (0, Bpad - B)))
    x_t = _batched_solve_matrix_t(L_t, D_t, R_t, n, bt=bt0)
    return jnp.transpose(x_t, (2, 0, 1))[:B, :n, :k]


# ---------------------------------------------------------------------------
# layout wrappers: (B, n, n) <-> (npad, npad, Bpad)
# ---------------------------------------------------------------------------

def batched_ldlt_pallas(A: jnp.ndarray, pivot_floor: float = PIVOT_FLOOR):
    """A: (B, n, n) -> (L, D) with L (B, n, n) unit-lower, D (B, n)."""
    B, n, _ = A.shape
    if n == 0:
        return jnp.zeros_like(A), jnp.zeros((B, 0), A.dtype)
    npad = max(_round_up(n, 8), 8)
    bt0 = _pick_bt(npad, _round_up(max(B, 1), LANE), A.dtype)
    Bpad = _round_up(max(B, 1), bt0)
    A_t = jnp.transpose(A, (1, 2, 0))
    A_t = jnp.pad(A_t, ((0, npad - n), (0, npad - n), (0, Bpad - B)))
    L_t, D_t = _batched_factor_t(A_t, n, pivot_floor, bt=bt0)
    L = jnp.transpose(L_t, (2, 0, 1))[:B, :n, :n]
    D = jnp.transpose(D_t, (1, 0))[:B, :n]
    return L, D


def batched_solve_ldlt_pallas(L: jnp.ndarray, D: jnp.ndarray,
                              b: jnp.ndarray):
    """L (B, n, n), D (B, n), b (B, n) -> x (B, n)."""
    B, n, _ = L.shape
    if n == 0:
        return b
    npad = max(_round_up(n, 8), 8)
    bt0 = _pick_bt(npad, _round_up(max(B, 1), LANE), L.dtype)
    Bpad = _round_up(max(B, 1), bt0)
    L_t = jnp.pad(jnp.transpose(L, (1, 2, 0)),
                  ((0, npad - n), (0, npad - n), (0, Bpad - B)))
    D_t = jnp.pad(jnp.transpose(D, (1, 0)), ((0, npad - n), (0, Bpad - B)),
                  constant_values=1.0)
    b_t = jnp.pad(jnp.transpose(b, (1, 0)), ((0, npad - n), (0, Bpad - B)))
    x_t = _batched_solve_t(L_t, D_t, b_t, n, bt=bt0)
    return jnp.transpose(x_t, (1, 0))[:B, :n]


# ---------------------------------------------------------------------------
# custom_vmap entry points: single-instance fallback, batched Pallas rule
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def ldlt_auto(A: jnp.ndarray):
    """LDL^T that automatically switches to the batched Pallas kernel
    under vmap. Single-instance calls use the panel-blocked jnp kernel
    (identical to the column kernel below one panel width)."""
    from .blocked_ldlt import ldlt_blocked
    return ldlt_blocked(A, PIVOT_FLOOR)


@ldlt_auto.def_vmap
def _ldlt_auto_vmap(axis_size, in_batched, A):
    (a_batched,) = in_batched
    assert a_batched
    if not _pl_fits(A.shape[-1], A.dtype):
        from .blocked_ldlt import ldlt_blocked
        L, D = jax.vmap(lambda a: ldlt_blocked(a, PIVOT_FLOOR))(A)
        return (L, D), (True, True)
    L, D = batched_ldlt_pallas(A, PIVOT_FLOOR)
    return (L, D), (True, True)


@jax.custom_batching.custom_vmap
def solve_ldlt_auto(L: jnp.ndarray, D: jnp.ndarray, b: jnp.ndarray):
    return solve_ldlt(L, D, b)


@solve_ldlt_auto.def_vmap
def _solve_ldlt_auto_vmap(axis_size, in_batched, L, D, b):
    assert all(in_batched)
    if not _pl_fits(L.shape[-1], L.dtype):
        x = jax.vmap(solve_ldlt)(L, D, b)
        return x, True
    x = batched_solve_ldlt_pallas(L, D, b)
    return x, True
