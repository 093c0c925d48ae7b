"""Multi-device execution: meshes, sharded batches, Schur complements."""

from ..utils.precision import apply_default_matmul_precision

apply_default_matmul_precision()

from .mesh import batch_sharding, make_mesh, replicated
from .schur import BlockQPData, SchurIPM, SchurResult, SchurState

__all__ = ["batch_sharding", "make_mesh", "replicated", "BlockQPData",
           "SchurIPM", "SchurResult", "SchurState"]
