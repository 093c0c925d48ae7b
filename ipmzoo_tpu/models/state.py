"""Pytree state/result containers of the compiled IPM solver."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


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

