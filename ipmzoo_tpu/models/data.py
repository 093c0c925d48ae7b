"""Problem data and solver state pytrees.

``QPData`` is the numeric counterpart of the reference's ``Data`` struct
(/root/reference/include/NumericalOptimization/EnvironmentBuilder.h:7-17):
dense convex-QP data

    minimize    1/2 x^T Q x + c^T x
    subject to  l_A <= A_ineq x <= u_A
                A_eq x = b_eq
                l_x <= x <= u_x

As a registered pytree it vmaps/shards directly: a batch of QPs is simply
a ``QPData`` whose leaves carry a leading batch axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QPData:
    Q: jnp.ndarray        # (n, n) symmetric
    c: jnp.ndarray        # (n,)
    A_ineq: jnp.ndarray   # (m_ineq, n)
    l_A_ineq: jnp.ndarray  # (m_ineq,)
    u_A_ineq: jnp.ndarray  # (m_ineq,)
    A_eq: jnp.ndarray     # (m_eq, n)
    b_eq: jnp.ndarray     # (m_eq,)
    l_x: jnp.ndarray      # (n,)
    u_x: jnp.ndarray      # (n,)

    def tree_flatten(self):
        return ((self.Q, self.c, self.A_ineq, self.l_A_ineq, self.u_A_ineq,
                 self.A_eq, self.b_eq, self.l_x, self.u_x), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def n(self) -> int:
        return self.Q.shape[-1]

    @property
    def m_ineq(self) -> int:
        return self.A_ineq.shape[-2]

    @property
    def m_eq(self) -> int:
        return self.A_eq.shape[-2]

    @staticmethod
    def make(Q, c, A_ineq=None, l_A_ineq=None, u_A_ineq=None, A_eq=None,
             b_eq=None, l_x=None, u_x=None, dtype=None) -> "QPData":
        """Build QPData with absent constraint groups as size-0 arrays."""
        Q = jnp.asarray(Q, dtype)
        dtype = Q.dtype
        n = Q.shape[-1]
        batch = Q.shape[:-2]   # leading batch axes, if any
        c = jnp.asarray(c, dtype)

        def arr(v, tail):
            return (jnp.zeros(batch + tail, dtype) if v is None
                    else jnp.asarray(v, dtype))

        A_ineq = arr(A_ineq, (0, n))
        m_i = A_ineq.shape[-2]
        A_eq = arr(A_eq, (0, n))
        m_e = A_eq.shape[-2]
        return QPData(
            Q=Q, c=c, A_ineq=A_ineq,
            l_A_ineq=arr(l_A_ineq, (m_i,)), u_A_ineq=arr(u_A_ineq, (m_i,)),
            A_eq=A_eq, b_eq=arr(b_eq, (m_e,)),
            l_x=arr(l_x, (n,)), u_x=arr(u_x, (n,)))


def validate(data: QPData) -> None:
    """Host-side sanity checks (mirrors build_environment's asserts)."""
    lx, ux = np.asarray(data.l_x), np.asarray(data.u_x)
    la, ua = np.asarray(data.l_A_ineq), np.asarray(data.u_A_ineq)
    if lx.size and not (lx < ux).all():
        raise ValueError("require l_x < u_x elementwise")
    if la.size and not (la <= ua).all():
        raise ValueError("require l_A_ineq <= u_A_ineq elementwise")
