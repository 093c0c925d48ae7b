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
* levels: ONE ``lax.fori_loop`` whose trip index is the level — the
  level stride enters only through dynamic ``pltpu.roll`` shifts,
  iota masks, and dynamic-indexed stores/loads of the per-level factor
  slabs, so the compiled kernel holds a single level body (~8k Mosaic
  ops) instead of levels x that.  (The first version unrolled all the
  levels: ~100k ops in one kernel, a Mosaic compile that never finished
  on hardware — and killing it mid-compile wedges the TPU tunnel.)
* masked redundant compute: every lane computes every level; dead lanes
  hold garbage that is never read (all roll sources are live lanes by
  induction), and the Cholesky input is substituted with the identity
  off the live-odd mask so no NaN/overflow can form.
* block primitives build rows/columns as Python lists and ``stack``
  once — no ``.at[].set`` scatters inside the hot loops.

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
from jax import lax
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


def _chol_cols(P, b):
    """Lower Cholesky of a (b, b, W) lane-batch of SPD blocks, as a list
    of (b, W) columns (rows above the diagonal hold garbage that is
    never read) plus the inverse diagonal."""
    cols, inv_d = [], []
    for j in range(b):
        acc = P[j, j, :]
        for k in range(j):
            acc = acc - cols[k][j, :] * cols[k][j, :]
        d = jnp.sqrt(acc)
        idj = 1.0 / d
        inv_d.append(idj)
        col = P[:, j, :]
        for k in range(j):
            col = col - cols[k] * cols[k][j, :][None, :]
        cols.append(col * idj[None, :])
    return cols, inv_d


def _chol_inv(P, b):
    """Explicit inverse of a lane-batch of SPD blocks via Cholesky:
    Pinv = Linv^T Linv.  Returns (b, b, W)."""
    cols, inv_d = _chol_cols(P, b)
    # forward-substitute the identity:
    # X[i] = (e_i - sum_{k<i} L[i,k] X[k]) / L[i,i];  X[i] is row i of
    # Linv as a (b, W) array (its cols j > i are garbage, never read:
    # row i of Linv has support only on j <= i, and e_i contributes 0
    # beyond i).
    rows = []
    for i in range(b):
        acc = None
        for k in range(i):
            t = cols[k][i, :][None, :] * rows[k]
            acc = t if acc is None else acc + t
        e = _eye_row(i, b, P.shape[-1], P.dtype)
        acc = e if acc is None else e - acc
        rows.append(acc * inv_d[i][None, :])
    # Pinv[i,j] = sum_k Linv[k,i] Linv[k,j]; mask row k of Linv to its
    # valid support j <= k before the rank-1 accumulation
    iot = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    Pinv = None
    for k in range(b):
        xk = jnp.where(iot <= k, rows[k], 0.0)
        t = xk[:, None, :] * xk[None, :, :]
        Pinv = t if Pinv is None else Pinv + t
    return Pinv


def _mm(A, B, b, ta=False, tb=False):
    """(b, b, W) lane-batched matmul with optional transposes."""
    out_rows = []
    for i in range(b):
        acc = None
        for j in range(b):
            a = A[j, i, :] if ta else A[i, j, :]
            brow = B[:, j, :] if tb else B[j, :, :]
            t = a[None, :] * brow
            acc = t if acc is None else acc + t
        out_rows.append(acc)                # row i of C, cols on axis 0
    return jnp.stack(out_rows, axis=0)


def _mv(A, x, b, ta=False, sym=False):
    """(b, b, W) @ (k, b, W) lane-batched matvec (k rhs on axis 0 of x).

    Returns (k, b, W).  Slice-free formulations: strided middle-axis
    slices (``A[:, j, :]`` / ``x[:, j, :]``) cost a relayout per slice
    in Mosaic and dominated the first version (measured 86 us for the
    k=8 sweep at b=16, W=256; 30 us after this rewrite).

    * ta=False / sym=True: row-reduce — row i of the output is a
      leading-axis slice of A times x, summed over the shared axis
      (``sym`` asserts A symmetric so A's rows ARE its columns).
    * ta=True: broadcast — materialise A[None] * x[:, :, None] once and
      sublane-reduce the shared axis; no slices at all."""
    if ta and not sym:
        return jnp.sum(A[None, :, :, :] * x[:, :, None, :], axis=1)
    rows = [jnp.sum(A[i][None, :, :] * x, axis=1) for i in range(b)]
    return jnp.stack(rows, axis=1)


def _eye_row(i, b, W, dtype):
    """Row i of the b x b identity, lane-broadcast to (b, W).

    Built from an iota mask — ``.at[i].set`` lowers to a ``scatter``
    primitive, which Mosaic does not implement (a TPU-only lowering
    failure that interpret-mode CPU tests cannot catch)."""
    iot = lax.broadcasted_iota(jnp.int32, (b, W), 0)
    return jnp.where(iot == i, 1.0, 0.0).astype(dtype)


def _roll(x, shift, W):
    """Roll along the lane (last) axis by a (possibly dynamic,
    non-negative) ``shift``; shift W acts as identity."""
    if _interpret():
        return jnp.roll(x, shift, axis=-1)
    if isinstance(shift, int):
        shift = shift % W
    return pltpu.roll(x, shift, axis=x.ndim - 1)


# ---------------------------------------------------------------------------
# factor kernel: all levels of the reduction in one kernel, one fori body
# ---------------------------------------------------------------------------


def _factor_kernel(b: int, W: int, levels: int,
                   d_ref, e_ref, pinv_ref, eb_ref, ea_ref, root_ref):
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    eye = jnp.stack([_eye_row(i, b, W, d_ref.dtype) for i in range(b)],
                    axis=0)

    def body(lev, carry):
        D, E = carry
        s = jnp.left_shift(jnp.int32(1), lev)
        # live-odd lanes of this level: p % 2s == s
        odd = (lane % (2 * s)) == s
        P = jnp.where(odd, D, eye)
        Pinv = _chol_inv(P, b)
        # align odd-lane quantities onto the even lanes they update
        # (roll by -s == roll by W - s)
        Pinv_a = _roll(Pinv, W - s, W)
        Ea_a = _roll(E, W - s, W)            # E[2k'+1] -> lane 2k's
        Eb = E                               # E[2k'] already at 2k's
        PiEb = _mm(Pinv_a, Eb, b)
        De = D - _mm(Eb, PiEb, b, ta=True)   # Eb^T PiEb
        EaPi = _mm(Ea_a, Pinv_a, b)
        left = _mm(EaPi, Ea_a, b, tb=True)   # Ea Pinv Ea^T at even lanes
        shifted = _roll(left, (2 * s) % W, W)
        De = De - jnp.where(lane >= 2 * s, shifted, 0.0)
        Enew = -_mm(Ea_a, PiEb, b)
        pinv_ref[pl.ds(lev, 1)] = Pinv_a[None]
        eb_ref[pl.ds(lev, 1)] = Eb[None]
        ea_ref[pl.ds(lev, 1)] = Ea_a[None]
        return De, Enew

    D, E = lax.fori_loop(0, levels, body, (d_ref[...], e_ref[...]))
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
        in_specs=[
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
                  pinv_ref, eb_ref, ea_ref, root_ref, r_ref, x_ref,
                  stack_ref):
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

    # rhs as (k, b, W): rhs index leads so _mv threads all k at once
    rs = jnp.transpose(r_ref[...], (1, 0, 2))

    def down(lev, rs):
        s = jnp.left_shift(jnp.int32(1), lev)
        Pinv_a = pinv_ref[pl.ds(lev, 1)][0]
        Eb = eb_ref[pl.ds(lev, 1)][0]
        Ea_a = ea_ref[pl.ds(lev, 1)][0]
        ro_a = _roll(rs, W - s, W)             # odd rhs -> even lanes
        g = _mv(Pinv_a, ro_a, b, sym=True)
        upd = rs - _mv(Eb, g, b, ta=True)      # Eb^T g at even lanes
        fold = _roll(_mv(Ea_a, g, b), (2 * s) % W, W)
        upd = upd - jnp.where(lane >= 2 * s, fold, 0.0)
        stack_ref[pl.ds(lev, 1)] = ro_a[None]
        return upd

    rs = lax.fori_loop(0, levels, down, rs)

    x = _mv(root_ref[...], rs, b, sym=True)
    x = jnp.where(lane == 0, x, 0.0)

    def up(i, x):
        lev = levels - 1 - i
        s = jnp.left_shift(jnp.int32(1), lev)
        Pinv_a = pinv_ref[pl.ds(lev, 1)][0]
        Eb = eb_ref[pl.ds(lev, 1)][0]
        Ea_a = ea_ref[pl.ds(lev, 1)][0]
        ro_a = stack_ref[pl.ds(lev, 1)][0]
        odd = (lane % (2 * s)) == s
        # x at even lanes of this level; the next even neighbour for
        # Ea^T comes from lane + 2s, i.e. a roll by -2s == W - 2s
        # (zero past the top lane — the roll wraps)
        x_next = _roll(x, (W - 2 * s) % W, W)
        x_next = jnp.where(lane < W - 2 * s, x_next, 0.0)
        rhs = ro_a - _mv(Eb, x, b) - _mv(Ea_a, x_next, b, ta=True)
        xo = _mv(Pinv_a, rhs, b, sym=True)
        return jnp.where(odd, _roll(xo, s, W), x)

    x = lax.fori_loop(0, levels, up, x)
    x_ref[...] = jnp.transpose(x, (1, 0, 2))


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
        scratch_shapes=[pltpu.VMEM((levels, k, b, W), r.dtype)],
        interpret=_interpret(),
    )(f.Pinv, f.Eb, f.Ea, f.root, r_t)
    return jnp.transpose(x_t, (2, 0, 1))[:N]
