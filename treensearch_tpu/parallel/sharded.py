"""Multi-chip search over a ``jax.sharding.Mesh`` via ``shard_map``.

The reference is a single-process shared-memory library (SURVEY.md §5:
no distributed backend exists there); its structural analog of scaling is
the ghost-cell octree's overlapping leaves.  On TPU the equivalent is a
1-D device mesh over the *query* dimension:

  stage            sharding
  ---------------  -----------------------------------------------------
  input points     sharded along points axis, P('d')
  world AABB       local min/max + ``lax.pmin``/``lax.pmax`` over ICI
  keys + sort      ``lax.all_gather`` (tiled) then replicated sort —
                   the candidate structure is replicated (points are tiny:
                   16 B/point, so 10M points = 160 MB, well within HBM;
                   a distributed radix sort over morton ranges is the
                   planned upgrade, SURVEY.md §5 halo design)
  query chunks     sharded: each device runs the identical per-chunk
                   program (ops/pipeline.make_chunk_body) over its slice
                   of the chunk grid — this is >90% of the runtime and
                   scales linearly
  outputs          sharded along the chunk grid; the final un-permute
                   gather runs under GSPMD

Padding: the global point count is padded up to a multiple of
devices x chunk by duplicating point 0's coordinates; pad rows carry
original index >= n_real and are masked out of both queries and candidate
masks by the core pipeline (see ops/pipeline.py docstring).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SearchConfig, round_up
from ..ops import pipeline as pl
from ..ops.grid import GridState, update_grid


def _pad_rows(arr: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == 0:
        return arr
    pad = jnp.broadcast_to(arr[:1], (n_pad,) + arr.shape[1:])
    return jnp.concatenate([arr, pad], axis=0)


def build_and_search_sharded(points: jnp.ndarray,
                             radii: Optional[jnp.ndarray],
                             search_radius: jnp.ndarray,
                             cell_size: jnp.ndarray,
                             state: GridState,
                             cfg: SearchConfig,
                             mesh: Mesh,
                             axis: str = "d") -> tuple[dict, GridState]:
    """Sharded equivalent of ``ops.pipeline.build_and_search``.

    ``points``/``radii`` are global arrays (any sharding); outputs match
    the single-device program exactly.
    """
    n = cfg.n_points
    n_dev = mesh.shape[axis]
    if n == 0:
        state = update_grid(state, points, cell_size)
        return pl._empty_solution(cfg, state), state

    # grid box from the real points only (host of the jit program; GSPMD
    # partitions the reduce + inserts the collectives)
    state = update_grid(state, points, cell_size)

    n_chunks = -(-n // cfg.chunk)
    n_chunks = round_up(n_chunks, n_dev)
    n_total = n_chunks * cfg.chunk
    points_p = _pad_rows(points, n_total - n)
    radii_p = _pad_rows(radii, n_total - n) if cfg.variable \
        else jnp.zeros((n_total,), jnp.float32)  # dummy: None is awkward in specs

    def device_program(pts_local, rad_local, chunk_ids_local, st):
        # exchange: every device needs the full sorted structure
        pts = jax.lax.all_gather(pts_local, axis, tiled=True)
        rad = jax.lax.all_gather(rad_local, axis, tiled=True) \
            if cfg.variable else None
        s = pl.sorted_structure(pts, rad, search_radius, st, cfg)
        body = pl.make_chunk_body(s, cfg)
        mapped = jax.lax.map(body, chunk_ids_local)
        return mapped

    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    in_specs = (P(axis), P(axis), P(axis), P())
    # chunk outputs are stacked along the (sharded) chunk axis; the scalar
    # cand_total reduces per device then globally below
    out_specs = jax.tree_util.tree_map(lambda _: P(axis), {
        "cand_total": 0,
        **{pl._pair_name(si, sj): {"counts": 0, "nbrs": 0}
           for (si, sj) in cfg.active_pairs},
    })
    mapped = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(points_p, radii_p, chunk_ids, state)

    # postprocess needs the sorted structure; recompute it globally (the
    # sort is duplicated work but keeps shard_map outputs small and lets
    # GSPMD place the gathers)
    s = pl.sorted_structure(points_p,
                            radii_p if cfg.variable else None,
                            search_radius, state, cfg)
    solution = pl.postprocess(mapped, s, state, cfg)
    return solution, state


def make_sharded_step(cfg: SearchConfig, mesh: Mesh, cell_size: float,
                      search_radius: float = 0.0, axis: str = "d"):
    """Jitted multi-chip step: (state, points, radii) -> (solution, state)."""

    @partial(jax.jit, static_argnames=())
    def step(state, points, radii=None):
        return build_and_search_sharded(
            points, radii, jnp.float32(search_radius),
            jnp.float32(cell_size), state, cfg, mesh, axis)

    return step
