"""Multi-device execution: meshes, sharded batches, Schur complements."""

from .mesh import batch_sharding, make_mesh, replicated
from .schur import BlockQPData, SchurIPM, SchurResult, SchurState

__all__ = ["batch_sharding", "make_mesh", "replicated", "BlockQPData",
           "SchurIPM", "SchurResult", "SchurState"]
