"""Static (compile-time) configuration for the jitted search program.

Everything in ``SearchConfig`` is part of the jit cache key: set sizes, the
active-search matrix, mode flags and the static padding caps.  Dynamic
quantities (positions, radii, cell size, search radius, grid state) stay on
device and never trigger recompiles.

The caps replace the reference's unbounded heap structures
(``chunked_vector``, ``TreeNSearch.h:394``) with static shapes: the engine
reports exact counts even when a cap is exceeded, sets an overflow flag,
and the host grows the cap and recompiles (SURVEY.md §7 step 7 /
BASELINE.json config 5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple


class SearchConfig(NamedTuple):
    """Hashable static config for one compiled search program."""

    set_sizes: Tuple[int, ...]           # points per set (static shapes)
    active_pairs: Tuple[Tuple[int, int], ...]  # ordered (set_i, set_j) searches
    variable: bool                       # per-point radii vs global radius
    symmetric: bool                      # symmetric OR rule (variable mode)
    stencil_w: int                       # stencil half-width in cells
    chunk: int                           # query points per pipeline tile
    cand_cap: int                        # max candidates per query point
    nbr_cap: int                         # max neighbors per (point, set_j)
    # optional PER-CANDIDATE-SET caps (len n_sets): candidate sets of very
    # different density get differently sized padded-CSR outputs on the
    # Pallas path (a thin boundary set must not pay the fluid's footprint);
    # None = nbr_cap for every set.  nbr_cap stays the global ceiling used
    # by the fallback paths.
    nbr_caps: object = None
    # scalar-path d^2 accumulation in float64 (reference scalar parity,
    # TreeNSearch.cpp:2080-2086: ``double squared_distance``); only the
    # search-based pipeline (run_scalar) reads it — the SIMD/Pallas paths
    # match the reference's SIMD float semantics by design (SURVEY.md §7).
    scalar_f64: bool = False

    @property
    def n_sets(self) -> int:
        return len(self.set_sizes)

    @property
    def n_points(self) -> int:
        return sum(self.set_sizes)

    @property
    def set_offsets(self) -> Tuple[int, ...]:
        off = [0]
        for s in self.set_sizes:
            off.append(off[-1] + s)
        return tuple(off)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
