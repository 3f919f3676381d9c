"""treensearch_tpu — a TPU-native neighborhood-search engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
InteractiveComputerGraphics/TreeNSearch (see /root/reference and SURVEY.md):

- fixed global OR per-point variable search radii (reference
  ``TreeNSearch/source/TreeNSearch.h:43``),
- multiple point sets with an arbitrary directed active-search matrix,
- optional symmetric search in variable-radius mode
  (``TreeNSearch.h:217-225``),
- Z-curve (Morton) reordering of arbitrary user arrays
  (``README.md:95-111``),
- incremental re-runs every simulation step with temporal-coherence state
  (AABB hysteresis, ``TreeNSearch.cpp:474-522``),
- results exposed as per-(set_i, set_j, point_i) ``NeighborList`` handles and
  a ``for_each_neighbor`` visitor (``TreeNSearch.h:182-195``).

The implementation is NOT a port of the reference's AVX2 octree: the whole
build+query step is a single jit-compiled XLA program built around a
row-major cell-key sort, stencil range search and masked padded-CSR
emission (see ``ops/pipeline.py``), with Pallas TPU kernels for the hot
pair loop and a ``shard_map`` multi-chip path in ``parallel/``.
"""

from .api import TreeNSearch
from .neighborlist import NeighborList, NeighborSolution
from .config import SearchConfig

__version__ = "0.1.0"

__all__ = [
    "TreeNSearch",
    "NeighborList",
    "NeighborSolution",
    "SearchConfig",
]
