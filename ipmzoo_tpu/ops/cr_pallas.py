"""Fused Pallas block-cyclic-reduction kernels for block-tridiagonal SPD
systems (the banded+arrow factor path).

Why: the XLA cyclic reduction in :mod:`.banded` (``cr_factor`` /
``cr_solve``) is already log2(N) *batched* levels, but each level still
emits ~6-8 separate XLA ops (batched Cholesky, triangular solves,
matmuls, pad/concat) — ~45 sequential device ops per IPM iteration.  At
the banded+arrow benchmark shape (n=4096, bandwidth 16, tip 8) the work
per op is microscopic, so the whole structured path is latency-bound:
0.93 ms/iteration against a ~0.04 ms flop budget (VERDICT r2 weak #1).

These kernels run the ENTIRE reduction — every level — inside one
``pallas_call``:

* layout: structure-of-arrays ``(b, b, N)`` — the block index is the
  LANE axis, block rows are sublanes.  Every block operation (Cholesky,
  triangular inverse, b x b matmul) becomes an unrolled chain of
  (b, N)-shaped VPU ops, batched over all N lanes at once.
* levels: a static Python loop (log2(N) <= 8 for the target shapes).
  Each level eliminates the odd blocks of its stride; neighbours are
  aligned with LANE ROLLS (`jnp.roll` on the last axis) instead of
  gathers — no dynamic slicing, no batched dot_general (both Mosaic
  gotchas; see CLAUDE.md).
* masked redundant compute: every lane computes every level; dead lanes
  hold garbage that is never read (all roll sources are live lanes by
  induction), and the Cholesky input is substituted with the identity
  off the live-odd mask so no NaN/overflow can form.

Eliminating the odd blocks of an SPD block-tridiagonal matrix is a
symmetrically permuted block Cholesky, so SPD is preserved level to
level (same argument as the XLA path).  The kernels are bit-compatible
with ``cr_factor``/``cr_solve`` up to float reassociation and are
tested against them (tests/test_cr_pallas.py).

The reference has no structured path at all (its elimination is
symbolic and row-at-a-time, /root/reference/src/SymbolicOptimization.cpp
:529-567); this is part of the TPU-native scaling redesign (SURVEY §5
scaling axis (c)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pow2_at_least(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


# ---------------------------------------------------------------------------
# in-kernel b x b block primitives, batched over the lane axis
# (arrays are (b, b, W) or (b, W); all loops unrolled at trace time)
# ---------------------------------------------------------------------------


def _chol(P, b):
    """Lower Cholesky of a (b, b, W) lane-batch of SPD blocks.
    Returns (L, inv_diag) with L strictly-lower+diag rows as a list of
    (b, W) arrays indexed [row][col] implicitly via array ops."""
    L = jnp.zeros_like(P)
    inv_d = []
    for j in range(b):
        acc = P[j, j, :]
        for k in range(j):
            acc = acc - L[j, k, :] * L[j, k, :]
        d = jnp.sqrt(acc)
        idj = 1.0 / d
        inv_d.append(idj)
        col = P[:, j, :]
        for k in range(j):
            col = col - L[:, k, :] * L[j, k, :][None, :]
        col = col * idj[None, :]
        # keep rows >= j only (strictly upper stays zero)
        keep = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) >= j
        L = L.at[:, j, :].set(jnp.where(keep, col, 0.0))
    return L, inv_d


def _chol_inv(P, b):
    """Explicit inverse of a lane-batch of SPD blocks via Cholesky:
    Pinv = Linv^T Linv.  Returns (b, b, W)."""
    L, inv_d = _chol(P, b)
    # forward-substitute the identity: X[i] = (e_i - sum_{k<i} L[i,k] X[k]) / L[i,i]
    rows = []
    for i in range(b):
        e = jnp.zeros_like(P[0])            # (b, W)
        e = e.at[i, :].set(1.0)
        acc = e
        for k in range(i):
            acc = acc - L[i, k, :][None, :] * rows[k]
        rows.append(acc * inv_d[i][None, :])
    X = jnp.stack(rows, axis=0)             # (b_row_of_Linv, b_col, W)
    # Pinv[i,j] = sum_k Linv[k,i] Linv[k,j]
    Pinv = jnp.zeros_like(P)
    for k in range(b):
        Pinv = Pinv + X[k, :, None, :] * X[k, None, :, :]
    return Pinv


def _mm(A, B, b, ta=False, tb=False):
    """(b, b, W) lane-batched matmul with optional transposes."""
    C = jnp.zeros_like(A)
    for i in range(b):
        acc = jnp.zeros_like(A[0])          # (b, W) row i of C, cols on axis 0
        for j in range(b):
            a = A[j, i, :] if ta else A[i, j, :]
            brow = B[:, j, :] if tb else B[j, :, :]
            acc = acc + a[None, :] * brow
        C = C.at[i, :, :].set(acc)
    return C


def _mv(A, x, b, ta=False):
    """(b, b, W) @ (b, W) lane-batched matvec."""
    acc = jnp.zeros_like(x)
    for j in range(b):
        a = A[j, :, :] if ta else A[:, j, :]
        acc = acc + a * x[j, :][None, :]
    return acc


def _roll(x, shift):
    """Roll along the lane (last) axis."""
    return pltpu.roll(x, shift, axis=x.ndim - 1) if not _interpret() \
        else jnp.roll(x, shift, axis=-1)


# ---------------------------------------------------------------------------
# factor kernel: all levels of the reduction in one kernel
# ---------------------------------------------------------------------------


def _factor_kernel(b: int, W: int, levels: int,
                   d_ref, e_ref, pinv_ref, eb_ref, ea_ref, root_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    eye = jnp.zeros((b, b, W), d_ref.dtype)
    for i in range(b):
        eye = eye.at[i, i, :].set(1.0)

    D = d_ref[...]
    E = e_ref[...]
    for lev in range(levels):
        s = 1 << lev
        # live-odd lanes of this level: p % 2s == s
        odd = (lane % (2 * s)) == s
        P = jnp.where(odd, D, eye)
        Pinv = _chol_inv(P, b)
        # align odd-lane quantities onto the even lanes they update
        Pinv_a = _roll(Pinv, -s)
        Ea_a = _roll(E, -s)                  # E[2k'+1] -> lane 2k's
        Eb = E                               # E[2k'] already at 2k's
        PiEb = _mm(Pinv_a, Eb, b)
        De = D - _mm(Eb, PiEb, b, ta=True)   # Eb^T PiEb
        EaPi = _mm(Ea_a, Pinv_a, b)
        left = _mm(EaPi, Ea_a, b, tb=True)   # Ea Pinv Ea^T at even lanes
        shifted = _roll(left, 2 * s)
        De = De - jnp.where(lane >= 2 * s, shifted, 0.0)
        Enew = -_mm(Ea_a, PiEb, b)
        pinv_ref[lev] = Pinv_a
        eb_ref[lev] = Eb
        ea_ref[lev] = Ea_a
        D, E = De, Enew
    # root pivot lives at lane 0
    root_ref[...] = _chol_inv(jnp.where(lane == 0, D, eye), b)


class CRPLFactors(NamedTuple):
    Pinv: jnp.ndarray    # (levels, b, b, W) aligned to even lanes
    Eb: jnp.ndarray      # (levels, b, b, W)
    Ea: jnp.ndarray      # (levels, b, b, W) aligned to even lanes
    root: jnp.ndarray    # (b, b, W); lane 0 holds the root inverse
    n_blocks: int        # original (unpadded) block count


def cr_factor_pallas(D: jnp.ndarray, E: jnp.ndarray) -> CRPLFactors:
    """Cyclic-reduction factorisation, whole reduction in ONE kernel.

    D: (N, b, b) SPD diagonal blocks, E: (N-1, b, b) sub-diagonals.
    VMEM budget: ~(3*levels + 4) * b*b*W floats — for the target shapes
    (b=16, N=256: ~6.5 MB) comfortably resident."""
    N, b = D.shape[0], D.shape[-1]
    # full lane width on hardware; tight power of two in interpret mode
    # (CPU tests) where lane padding only costs time
    W = _pow2_at_least(N) if _interpret() else max(_pow2_at_least(N), LANE)
    levels = max(W.bit_length() - 1, 1)  # log2(W), >= 1 level
    dtype = D.dtype
    # SoA: lane = block index
    D_t = jnp.transpose(D, (1, 2, 0))
    D_t = jnp.pad(D_t, ((0, 0), (0, 0), (0, W - N)))
    # identity-pad the diagonal so padded pivots are invertible
    for i in range(b):
        D_t = D_t.at[i, i, N:].set(1.0)
    E_t = jnp.transpose(E, (1, 2, 0)) if E.shape[0] else \
        jnp.zeros((b, b, 0), dtype)
    E_t = jnp.pad(E_t, ((0, 0), (0, 0), (0, W - E_t.shape[-1])))

    kernel = functools.partial(_factor_kernel, b, W, levels)
    out_shape = (
        jax.ShapeDtypeStruct((levels, b, b, W), dtype),
        jax.ShapeDtypeStruct((levels, b, b, W), dtype),
        jax.ShapeDtypeStruct((levels, b, b, W), dtype),
        jax.ShapeDtypeStruct((b, b, W), dtype),
    )
    Pinv, Eb, Ea, root = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 0 + [
            pl.BlockSpec((b, b, W), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b, W), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b, W), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        interpret=_interpret(),
    )(D_t, E_t)
    return CRPLFactors(Pinv=Pinv, Eb=Eb, Ea=Ea, root=root, n_blocks=N)


# ---------------------------------------------------------------------------
# solve kernel: down-sweep + root + up-sweep in one kernel
# ---------------------------------------------------------------------------


def _solve_kernel(b: int, k: int, W: int, levels: int,
                  pinv_ref, eb_ref, ea_ref, root_ref, r_ref, x_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

    rs = [r_ref[:, c, :] for c in range(k)]        # k rhs, each (b, W)
    stack = []                                     # per level: aligned odd rhs
    for lev in range(levels):
        s = 1 << lev
        Pinv_a, Eb, Ea_a = pinv_ref[lev], eb_ref[lev], ea_ref[lev]
        new_rs, ro_lev = [], []
        for c in range(k):
            ro_a = _roll(rs[c][None], -s)[0]       # odd rhs -> even lanes
            g = _mv(Pinv_a, ro_a, b)
            upd = rs[c] - _mv(Eb, g, b, ta=True)   # Eb^T g at even lanes
            fold = _roll(_mv(Ea_a, g, b)[None], 2 * s)[0]
            upd = upd - jnp.where(lane[0] >= 2 * s, fold, 0.0)
            new_rs.append(upd)
            ro_lev.append(ro_a)
        rs = new_rs
        stack.append(ro_lev)

    xs = []
    for c in range(k):
        x = _mv(root_ref[...], rs[c], b)
        x = jnp.where(lane[0] == 0, x, 0.0)
        xs.append(x)

    for lev in reversed(range(levels)):
        s = 1 << lev
        Pinv_a, Eb, Ea_a = pinv_ref[lev], eb_ref[lev], ea_ref[lev]
        odd = (lane[0] % (2 * s)) == s
        for c in range(k):
            x = xs[c]
            # x at even lanes of this level; next even neighbour for
            # Ea^T (zero past the top lane — the roll wraps)
            x_next = _roll(x[None], -2 * s)[0]
            x_next = jnp.where(lane[0] < W - 2 * s, x_next, 0.0)
            rhs = stack[lev][c] - _mv(Eb, x, b) - \
                _mv(Ea_a, x_next, b, ta=True)
            xo = _mv(Pinv_a, rhs, b)
            xs[c] = jnp.where(odd, _roll(xo[None], s)[0], x)

    for c in range(k):
        x_ref[:, c, :] = xs[c]


def cr_solve_pallas(f: CRPLFactors, r: jnp.ndarray) -> jnp.ndarray:
    """Solve with :func:`cr_factor_pallas` factors; r: (N, b, k)."""
    N, b, k = r.shape
    levels, W = f.Pinv.shape[0], f.Pinv.shape[-1]
    r_t = jnp.transpose(r, (1, 2, 0))               # (b, k, N)
    r_t = jnp.pad(r_t, ((0, 0), (0, 0), (0, W - N)))
    kernel = functools.partial(_solve_kernel, b, k, W, levels)
    x_t = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, b, b, W), lambda: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b, W), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k, W), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, k, W), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, W), r.dtype),
        interpret=_interpret(),
    )(f.Pinv, f.Eb, f.Ea, f.root, r_t)
    return jnp.transpose(x_t, (2, 0, 1))[:N]
