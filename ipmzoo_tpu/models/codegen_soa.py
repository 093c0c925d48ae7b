"""Structure-of-arrays staging of symbolic expressions (Pallas-kernel
flavour of :mod:`.codegen`).

Inside the fused whole-solve TPU kernel, every per-instance quantity
carries a trailing batch (lane) dimension:

  ``scalar``  (1, BT)
  ``vector``  (k, BT)
  ``diag``    (k, BT)
  ``matrix``  (k, l, BT)
  ``rowvec``  (k, BT)

All operations lower to Mosaic-friendly primitives: elementwise VPU ops
and reductions over non-lane axes — no batched ``dot_general`` (which
Mosaic cannot lower).  The evaluator API mirrors
:func:`ipmzoo_tpu.models.codegen.evaluate`, so the fused kernel body is
generated from exactly the same symbolic Newton system/delta definitions
as the XLA solver, keeping the two numerically in lockstep.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from ..symbolic.expr import Expr, Kind


@dataclasses.dataclass(frozen=True)
class TV:
    tag: str          # 'scalar' | 'vector' | 'diag' | 'matrix' | 'rowvec'
    val: jnp.ndarray  # trailing dim = batch lane


def scalar(x) -> TV:
    return TV("scalar", x)


def vector(x) -> TV:
    return TV("vector", x)


def diag(x) -> TV:
    return TV("diag", x)


def matrix(x) -> TV:
    return TV("matrix", x)


Env = Dict[Expr, TV]

_VECLIKE = ("vector", "diag", "rowvec")


def _safe_reciprocal(x):
    big = np.sqrt(np.finfo(np.float32).max)
    return jnp.where(x == 0, jnp.asarray(big, x.dtype),
                     1.0 / jnp.where(x == 0, 1.0, x))


def negate_tv(x: TV) -> TV:
    return TV(x.tag, -x.val)


def invert_tv(x: TV) -> TV:
    assert x.tag != "matrix"
    return TV(x.tag, _safe_reciprocal(x.val))


def _bz(a, b):
    """Empty-operand broadcast for (k, BT) arrays."""
    if a.ndim == 2 and b.ndim == 2 and a.shape[0] != b.shape[0]:
        if a.shape[0] == 0:
            a = jnp.zeros_like(b)
        elif b.shape[0] == 0:
            b = jnp.zeros_like(a)
    return a, b


def add_tv(x: TV, y: TV) -> TV:
    if x.tag == "scalar" and y.tag == "scalar":
        return scalar(x.val + y.val)
    if x.tag == "diag" and y.tag == "diag":
        a, b = _bz(x.val, y.val)
        return diag(a + b)
    if x.tag in _VECLIKE and y.tag in _VECLIKE:
        a, b = _bz(x.val, y.val)
        tag = "rowvec" if "rowvec" in (x.tag, y.tag) else "vector"
        return TV(tag, a + b)
    if x.tag == "matrix" and y.tag == "diag":
        k = x.val.shape[0]
        eye = jnp.eye(k, dtype=x.val.dtype)[:, :, None]
        return matrix(x.val + eye * y.val[:, None, :])
    if x.tag == "diag" and y.tag == "matrix":
        return add_tv(y, x)
    if x.tag == "matrix" and y.tag == "matrix":
        return matrix(x.val + y.val)
    # identity convention (see codegen.add_tv): a literal scalar in an
    # additive matrix context is scalar * I
    if x.tag == "scalar" and y.tag == "diag":
        return diag(y.val + x.val)
    if x.tag == "diag" and y.tag == "scalar":
        return diag(x.val + y.val)
    if x.tag == "scalar" and y.tag == "matrix":
        k = y.val.shape[0]
        eye = jnp.eye(k, dtype=y.val.dtype)[:, :, None]
        return matrix(y.val + eye * x.val[:, None, :])
    if x.tag == "matrix" and y.tag == "scalar":
        return add_tv(y, x)
    raise TypeError(f"cannot add {x.tag} and {y.tag}")


def multiply_tv(x: TV, y: TV) -> TV:
    xt, yt = x.tag, y.tag
    if xt == "scalar":
        if yt == "matrix":
            return matrix(x.val[:, None, :] * y.val)
        if yt == "scalar":
            return scalar(x.val * y.val)
        return TV(yt, x.val * y.val)
    if yt == "scalar":
        return multiply_tv(y, x) if xt != "matrix" else \
            matrix(x.val * y.val[:, None, :])
    # any (row)vector pair is a dot product — mirrors codegen.py /
    # the reference's ValVector semantics
    if xt in ("vector", "rowvec") and yt in ("vector", "rowvec"):
        return scalar(jnp.sum(x.val * y.val, axis=0, keepdims=True))
    if xt in _VECLIKE and yt in _VECLIKE:
        if xt == "diag" and yt == "diag":
            return diag(x.val * y.val)
        tag = yt if xt == "diag" else xt
        return TV(tag, x.val * y.val)
    if xt == "matrix" and yt == "vector":
        # (k, l, BT) x (l, BT) -> (k, BT): multiply-reduce over axis 1
        return vector(jnp.sum(x.val * y.val[None, :, :], axis=1))
    if xt in ("rowvec", "vector") and yt == "matrix":
        # v^T M: reduce over rows -> (l, BT) rowvec
        return TV("rowvec", jnp.sum(y.val * x.val[:, None, :], axis=0))
    if xt == "matrix" and yt == "diag":
        return matrix(x.val * y.val[None, :, :])
    if xt == "diag" and yt == "matrix":
        return matrix(x.val[:, None, :] * y.val)
    raise TypeError(f"cannot multiply {xt} and {yt}")


def transpose_tv(x: TV) -> TV:
    if x.tag == "matrix":
        return matrix(jnp.swapaxes(x.val, 0, 1))
    if x.tag == "vector":
        return TV("rowvec", x.val)
    if x.tag == "rowvec":
        return vector(x.val)
    return x


def evaluate(e: Expr, env: Env, _memo=None) -> TV:
    if _memo is None:
        _memo = {}
    hit = env.get(e)
    if hit is not None:
        return hit
    hit = _memo.get(e)
    if hit is not None:
        return hit
    res = _evaluate(e, env, _memo)
    _memo[e] = res
    return res


def _evaluate(e: Expr, env: Env, memo) -> TV:
    k = e.kind
    if k == Kind.NUMBER:
        return scalar(jnp.full((1, 1), e.value, jnp.float32))
    if k in (Kind.NAMED_SCALAR, Kind.NAMED_VECTOR, Kind.VARIABLE,
             Kind.MATRIX, Kind.SYMMETRIC_MATRIX):
        raise KeyError(f"symbol {e!r} not bound in environment")
    if k == Kind.DIAGONAL_MATRIX:
        v = evaluate(e.child, env, memo)
        assert v.tag in ("vector", "rowvec")
        return diag(v.val)
    if k == Kind.TRANSPOSE:
        return transpose_tv(evaluate(e.child, env, memo))
    if k == Kind.INVERT:
        return invert_tv(evaluate(e.child, env, memo))
    if k == Kind.LOG:
        v = evaluate(e.child, env, memo)
        return TV(v.tag, jnp.log(v.val))
    if k == Kind.NEGATE:
        return negate_tv(evaluate(e.child, env, memo))
    if k == Kind.SUM:
        res = evaluate(e.terms[0], env, memo)
        for t in e.terms[1:]:
            res = add_tv(res, evaluate(t, env, memo))
        return res
    if k == Kind.PRODUCT:
        res = evaluate(e.terms[0], env, memo)
        for t in e.terms[1:]:
            res = multiply_tv(res, evaluate(t, env, memo))
        return res
    raise AssertionError(f"unknown kind {k}")


def as_vector(v: TV, size: int, bt: int, dtype) -> jnp.ndarray:
    if v.tag in _VECLIKE:
        if v.val.shape[0] == 0 and size > 0:
            return jnp.zeros((size, bt), dtype)
        return v.val
    if v.tag == "scalar" and size == 1:
        return jnp.broadcast_to(v.val, (1, bt)).astype(dtype)
    raise TypeError(f"cannot view {v.tag} as vector({size})")
