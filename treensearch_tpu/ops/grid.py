"""World-box tracking with hysteresis — the temporal-coherence carry state.

TPU-native equivalent of the reference's ``_update_world_AABB[_simd]``
(``TreeNSearch.cpp:415-645``): a min/max reduce over all points, hysteresis
(keep the previous grid if the new tight box still fits inside it,
``TreeNSearch.cpp:474-487``), enlargement by ``domain_enlargement`` when the
box must grow (``TreeNSearch.h:401``), and a hard limit of 2**15 cells per
axis (``TreeNSearch.cpp:510-515``).  The reference aborts with exit(-1) on
domain overflow; inside a jit program we instead set an error flag in the
carried state which the host API raises on observation.

Unlike the reference we do not need a *cubical power-of-two* box (that
existed to make the octree split cleanly); a per-axis cell count is enough
for key encoding and keeps the domain-overflow limit much farther away for
flat/elongated domains.

The state is a plain pytree so it can be carried through ``lax.scan`` in a
user's simulation loop with no host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.keys import MAX_CELLS_PER_DIM

DOMAIN_ENLARGEMENT = 1.1  # same default as the reference (TreeNSearch.h:401)


class GridState(NamedTuple):
    """Carried grid state (all device scalars/small arrays)."""
    valid: jnp.ndarray      # bool: grid_min/n_cells hold a usable grid
    grid_min: jnp.ndarray   # (3,) f32 — origin of cell (0,0,0)
    grid_max: jnp.ndarray   # (3,) f32 — end of the gridded region
    n_cells: jnp.ndarray    # (3,) i32 — cells per axis
    cell_size: jnp.ndarray  # () f32
    error: jnp.ndarray      # i32: 0 ok, 1 = domain exceeds MAX_CELLS_PER_DIM


def fresh_state() -> GridState:
    return GridState(
        valid=jnp.zeros((), jnp.bool_),
        grid_min=jnp.zeros((3,), jnp.float32),
        grid_max=jnp.zeros((3,), jnp.float32),
        n_cells=jnp.ones((3,), jnp.int32),
        cell_size=jnp.ones((), jnp.float32),
        error=jnp.zeros((), jnp.int32),
    )


def update_grid(state: GridState, points: jnp.ndarray,
                cell_size: jnp.ndarray) -> GridState:
    """Update the world grid from points (N, 3) f32 and a cell size scalar.

    Mirrors the hysteresis semantics of ``TreeNSearch.cpp:474-522``: if the
    previous grid is valid, was built with the same cell size, and the new
    tight AABB fits inside it, the previous grid is kept — so quantized
    coords (and therefore sort keys) are stable across steps when points
    move within the known world.
    """
    cell_size = jnp.asarray(cell_size, jnp.float32)
    n = points.shape[0]
    if n == 0:
        # Degenerate: a 1-cell grid at the origin; nothing will be searched.
        return GridState(
            valid=jnp.ones((), jnp.bool_),
            grid_min=jnp.zeros((3,), jnp.float32),
            grid_max=jnp.full((3,), cell_size, jnp.float32),
            n_cells=jnp.ones((3,), jnp.int32),
            cell_size=cell_size,
            error=jnp.zeros((), jnp.int32),
        )

    tight_min = jnp.min(points, axis=0)
    tight_max = jnp.max(points, axis=0)

    keep = (
        state.valid
        & (state.cell_size == cell_size)
        & jnp.all(tight_min >= state.grid_min)
        & jnp.all(tight_max <= state.grid_max)
    )

    # New (grown) grid: enlarge the tight box about its center.
    center = 0.5 * (tight_min + tight_max)
    half = 0.5 * DOMAIN_ENLARGEMENT * (tight_max - tight_min)
    # Guarantee a minimum of one cell of slack so points sitting exactly on
    # the tight box edge never quantize out of range after float round-off.
    half = jnp.maximum(half, 0.5 * cell_size)
    new_min = center - half
    new_extent = 2.0 * half
    new_n_cells_f = jnp.ceil(new_extent / cell_size)
    overflow = jnp.any(new_n_cells_f > MAX_CELLS_PER_DIM) & ~keep
    new_n_cells = jnp.clip(new_n_cells_f.astype(jnp.int32), 1, MAX_CELLS_PER_DIM)
    new_max = new_min + new_n_cells.astype(jnp.float32) * cell_size

    return GridState(
        valid=jnp.ones((), jnp.bool_),
        grid_min=jnp.where(keep, state.grid_min, new_min),
        grid_max=jnp.where(keep, state.grid_max, new_max),
        n_cells=jnp.where(keep, state.n_cells, new_n_cells),
        cell_size=cell_size,
        error=jnp.maximum(state.error, overflow.astype(jnp.int32)),
    )
