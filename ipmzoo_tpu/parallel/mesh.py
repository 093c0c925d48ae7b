"""Device-mesh helpers.

The framework's scaling axes (SURVEY §2.5, §5):

* ``dp`` — data parallelism over independent QP instances (vmapped solver
  sharded on the batch axis; no cross-device communication on the hot
  path, convergence metrics reduced with psum when requested).
* ``sp`` — structure parallelism over the blocks of a block-separable
  coupled QP (Schur-complement solve; psum of coupling contributions
  rides ICI).

Meshes are ordinary ``jax.sharding.Mesh`` objects; on a multi-host pod
slice call ``jax.distributed.initialize()`` first and the same code runs
unchanged with ICI/DCN collectives inserted by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With defaults, a 1-D data-parallel mesh over all devices.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
