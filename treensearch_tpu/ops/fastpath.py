"""TPU fast path: dense cell table + tile-shared candidate windows.

This is the throughput engine behind ``run()``.  It produces bit-identical
neighbor sets to the reference path (``ops/pipeline.py``) but is designed
around measured v5e characteristics (2026-08-16 microbenchmarks):

  - dependent-gather chains (binary search) cost ~0.4 us/element — the
    reference path's per-point stencil searches dominate its runtime;
  - contiguous dynamic slices run at HBM bandwidth;
  - VPU elementwise runs at Tflop/s; roll/where networks are cheap;
  - per-call dispatch through the axon tunnel is ~40 ms, so simulation
    loops must stay in-graph.

Design (cf. SURVEY.md §7 "TPU-native mapping"):

  1. One *dense* cell-start table over the padded grid replaces all
     searching: ``table[lin]`` = index of the first sorted point in cell
     ``lin``, empty cells backfilled with the next occupied cell's start
     (reverse cumulative min).  A stencil range is then two gathers.
     The grid is padded by the stencil half-width W on every side so
     boundary cells need no clamping and out-of-range stencil rows read
     empty border cells (the role of the reference octree's ghost cells,
     ``TreeNSearch.cpp:1211-1220``, re-imagined as table padding).
  2. Points are sorted by the *linear* padded cell id (single int32 key,
     row-major), so each stencil (di, dj) row is one contiguous range.
  3. Queries are processed in tiles of TILE consecutive sorted points.
     Because the shifted queries are monotone in sort order, the union of
     a tile's ranges per (di, dj) is exactly [start(first point),
     end(last point)] — 2 gathers per tile per stencil row.  The tile
     loads each window once as a contiguous dynamic slice (the role of
     the reference's per-leaf gather, ``_prepare_brute_force_simd``,
     ``TreeNSearch.cpp:2161-2399``) and tests all tile points against it
     on the VPU: zero per-candidate gathers.
  4. Emission compacts masked candidates into padded-CSR rows with the
     log-shift network (``utils/compact.py``) — the TPU equivalent of the
     reference's AVX2 LUT compaction (``TreeNSearch.cpp:2486-2492``).

Static caps (dense table size, window width, neighbor cap) carry overflow
flags; the host grows them and re-runs (recompile-on-overflow).  When the
domain is too sparse for a dense table (points on a thin surface in a huge
box), the host falls back to ``ops/pipeline.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..utils import keys as K
from ..utils.compact import compact_rows
from .grid import GridState, update_grid
from .pipeline import _empty_solution, _pair_name


class FastKnobs(NamedTuple):
    """Static performance knobs for the fast path."""
    tile: int = 128        # query points per tile
    group: int = 8         # tiles per lax.map iteration (vmapped)
    wcap: int = 256        # max points per stencil-row window
    dense_cap: int = 1 << 22  # dense cell-table slots


def _lin_coords(ijk: jnp.ndarray, w: int, dy: jnp.ndarray, dz: jnp.ndarray):
    """Padded linear cell id; ijk are unpadded int32 coords (N, 3)."""
    return ((ijk[..., 0] + w) * dy + (ijk[..., 1] + w)) * dz + (ijk[..., 2] + w)


def build_and_search_fast(points: jnp.ndarray,
                          radii: Optional[jnp.ndarray],
                          search_radius: jnp.ndarray,
                          cell_size: jnp.ndarray,
                          state: GridState,
                          cfg: SearchConfig,
                          knobs: FastKnobs) -> tuple[dict, GridState]:
    n = cfg.n_points
    state = update_grid(state, points, cell_size)
    if n == 0:
        sol = _empty_solution(cfg, state)
        sol["dense_overflow"] = jnp.zeros((), jnp.int32)
        return sol, state

    w = cfg.stencil_w
    tile, group, wcap = knobs.tile, knobs.group, knobs.wcap
    dense_cap = knobs.dense_cap

    kx, ky, kz = state.n_cells[0], state.n_cells[1], state.n_cells[2]
    dy = ky + 2 * w
    dz = kz + 2 * w
    dx = kx + 2 * w
    # overflow check in float to avoid int32 wrap on huge sparse domains
    dense_size_f = (dx.astype(jnp.float32) * dy.astype(jnp.float32)
                    * dz.astype(jnp.float32))
    dense_overflow = (dense_size_f > jnp.float32(dense_cap - 1)).astype(jnp.int32)

    inv_cell = 1.0 / state.cell_size
    ijk = K.quantize(points, state.grid_min, inv_cell, state.n_cells)
    lin = jnp.minimum(_lin_coords(ijk, w, dy, dz), dense_cap - 1)
    iota = jnp.arange(n, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)

    pts_s = points[idx_s]
    set_ids = jnp.asarray(np.repeat(
        np.arange(cfg.n_sets, dtype=np.int32), cfg.set_sizes))
    set_id_s = set_ids[idx_s]
    r_s = radii[idx_s] if cfg.variable else None
    ijk_s = K.quantize(pts_s, state.grid_min, inv_cell, state.n_cells)

    # dense cell-start table with reverse-cummin backfill
    table = jnp.full((dense_cap + 1,), n, jnp.int32)
    table = table.at[lin_s].min(iota)
    table = jax.lax.associative_scan(jnp.minimum, table, reverse=True)

    # packed candidate fields, padded by wcap rows so window slices never
    # clamp (padding rows carry orig index n => masked out)
    zeros_f = jnp.zeros((wcap,), jnp.float32)
    xf = jnp.concatenate([pts_s[:, 0], zeros_f])
    yf = jnp.concatenate([pts_s[:, 1], zeros_f])
    zf = jnp.concatenate([pts_s[:, 2], zeros_f])
    of = jnp.concatenate([idx_s, jnp.full((wcap,), n, jnp.int32)])
    sf = jnp.concatenate([set_id_s, jnp.full((wcap,), -1, jnp.int32)])
    rf = jnp.concatenate([r_s, zeros_f]) if cfg.variable else None

    offsets_arr = np.asarray(cfg.set_offsets, np.int32)
    r2_fixed = (search_radius * search_radius).astype(jnp.float32)
    offs_2d = [(di, dj) for di in range(-w, w + 1) for dj in range(-w, w + 1)]
    n_ranges = len(offs_2d)
    m_width = n_ranges * wcap
    slot_in_win = jnp.arange(wcap, dtype=jnp.int32)[None, :]

    n_tiles = -(-n // tile)
    n_groups = -(-n_tiles // group)
    k_sel = cfg.nbr_cap

    def tile_body(t):
        """One tile of `tile` consecutive sorted query points."""
        p0 = jnp.minimum(t * tile, n - 1)
        p1 = jnp.minimum(t * tile + tile - 1, n - 1)
        ijk0 = ijk_s[p0]
        ijk1 = ijk_s[p1]

        base = t * tile + jnp.arange(tile, dtype=jnp.int32)
        base_c = jnp.minimum(base, n - 1)
        row_valid = base < n
        my_orig = idx_s[base_c]
        my_set = set_id_s[base_c]
        qx = pts_s[base_c, 0][:, None]
        qy = pts_s[base_c, 1][:, None]
        qz = pts_s[base_c, 2][:, None]
        q_i = ijk_s[base_c, 0][:, None]
        q_j = ijk_s[base_c, 1][:, None]
        q_k = ijk_s[base_c, 2][:, None]
        my_r2 = (r_s[base_c] ** 2)[:, None] if cfg.variable else None
        gx, gy, gz = state.grid_min[0], state.grid_min[1], state.grid_min[2]

        def window(di, dj):
            # window hull: monotone shifted queries => [start(first pt),
            # end(last pt)] is the exact union of the tile's ranges
            q_lo = (((ijk0[0] + w + di) * dy + (ijk0[1] + w + dj)) * dz
                    + ijk0[2])
            q_hi = (((ijk1[0] + w + di) * dy + (ijk1[1] + w + dj)) * dz
                    + (ijk1[2] + 2 * w))
            start = table[jnp.clip(q_lo, 0, dense_cap)]
            end = table[jnp.clip(q_hi + 1, 0, dense_cap)]
            ln = jnp.maximum(end - start, 0)

            wx = jax.lax.dynamic_slice(xf, (start,), (wcap,))[None, :]
            wy = jax.lax.dynamic_slice(yf, (start,), (wcap,))[None, :]
            wz = jax.lax.dynamic_slice(zf, (start,), (wcap,))[None, :]
            wo = jax.lax.dynamic_slice(of, (start,), (wcap,))[None, :]
            ws = jax.lax.dynamic_slice(sf, (start,), (wcap,))[None, :]

            ddx = wx - qx
            ddy = wy - qy
            ddz = wz - qz
            d2 = (ddx * ddx + ddy * ddy) + ddz * ddz  # f32, oracle order
            if cfg.variable:
                crit = d2 <= my_r2
                if cfg.symmetric:
                    wr = jax.lax.dynamic_slice(rf, (start,), (wcap,))[None, :]
                    crit = crit | (d2 <= wr * wr)
            else:
                crit = d2 <= r2_fixed
            # hulls of different (di, dj) overlap when a tile spans grid
            # rows; requiring the candidate's own cell to match exactly
            # this stencil offset makes the windows disjoint (each
            # neighbor is counted in precisely one window)
            c_i = jnp.clip(jnp.floor((wx - gx) * inv_cell), 0,
                           (kx - 1).astype(jnp.float32)).astype(jnp.int32)
            c_j = jnp.clip(jnp.floor((wy - gy) * inv_cell), 0,
                           (ky - 1).astype(jnp.float32)).astype(jnp.int32)
            c_k = jnp.clip(jnp.floor((wz - gz) * inv_cell), 0,
                           (kz - 1).astype(jnp.float32)).astype(jnp.int32)
            in_stencil = ((c_i == q_i + di) & (c_j == q_j + dj)
                          & (jnp.abs(c_k - q_k) <= w))
            m = (crit & in_stencil & (slot_in_win < ln)
                 & (wo != my_orig[:, None]) & row_valid[:, None])
            if cfg.n_sets == 1:
                loc_j = wo
            else:
                off_j = jnp.zeros_like(wo)
                for sj in range(cfg.n_sets):
                    off_j = jnp.where(ws == sj, offsets_arr[sj], off_j)
                loc_j = wo - off_j
            return m, loc_j * jnp.ones((tile, 1), jnp.int32), \
                ws * jnp.ones((tile, 1), jnp.int32), ln

        offs = np.asarray(offs_2d, np.int32)
        m9, lj9, ws9, ln9 = jax.vmap(window)(
            jnp.asarray(offs[:, 0]), jnp.asarray(offs[:, 1]))
        # (R, tile, wcap) -> (tile, R*wcap)
        mask_all = jnp.transpose(m9, (1, 0, 2)).reshape(tile, m_width)
        locj_all = jnp.transpose(lj9, (1, 0, 2)).reshape(tile, m_width)
        wset_all = jnp.transpose(ws9, (1, 0, 2)).reshape(tile, m_width)
        win_max = jnp.max(ln9)

        out = {"cand_total": win_max}
        for (si, sj) in cfg.active_pairs:
            pm = mask_all & (my_set == si)[:, None]
            if cfg.n_sets > 1:
                pm = pm & (wset_all == sj)
            cnt = jnp.sum(pm, axis=1).astype(jnp.int32)
            nbr = compact_rows(pm, locj_all, k_sel)
            out[_pair_name(si, sj)] = {"counts": cnt, "nbrs": nbr}
        return out

    def group_body(g):
        ts = g * group + jnp.arange(group, dtype=jnp.int32)
        return jax.vmap(tile_body)(ts)

    mapped = jax.lax.map(group_body, jnp.arange(n_groups, dtype=jnp.int32))
    # flatten (n_groups, group, tile, ...) -> (n_groups*group*tile, ...)

    inv_perm = jnp.zeros((n,), jnp.int32).at[idx_s].set(iota,
                                                        unique_indices=True)
    pairs = {}
    for (si, sj) in cfg.active_pairs:
        name = _pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        cnt_all = mapped[name]["counts"].reshape(-1)
        nbr_all = mapped[name]["nbrs"].reshape(-1, k_sel)
        if n_i > 0:
            rows = jax.lax.dynamic_slice_in_dim(inv_perm,
                                                cfg.set_offsets[si], n_i)
            counts = cnt_all[rows]
            nbrs = nbr_all[rows]
            max_count = jnp.max(counts)
        else:
            counts = jnp.zeros((0,), jnp.int32)
            nbrs = jnp.zeros((0, k_sel), jnp.int32)
            max_count = jnp.zeros((), jnp.int32)
        pairs[name] = {"counts": counts, "nbrs": nbrs, "max_count": max_count}

    if n > 1:
        n_cells_stat = 1 + jnp.sum(lin_s[1:] != lin_s[:-1])
    else:
        n_cells_stat = jnp.asarray(n, jnp.int32)

    solution = {
        "pairs": pairs,
        "cand_max": jnp.max(mapped["cand_total"]),  # widest window seen
        "n_cells": n_cells_stat,
        "error": state.error,
        "dense_overflow": dense_overflow,
    }
    return solution, state


@partial(jax.jit, static_argnames=("cfg", "knobs"))
def build_and_search_fast_jit(points, radii, search_radius, cell_size, state,
                              cfg: SearchConfig, knobs: FastKnobs):
    return build_and_search_fast(points, radii, search_radius, cell_size,
                                 state, cfg, knobs)
