"""The fused build+search program — TPU-native replacement for ``run()``.

One jit-compiled XLA program reproduces the reference pipeline
(``TreeNSearch.cpp:138-149``) with an architecture designed for the TPU
compilation model instead of the reference's octree + per-leaf brute force:

  reference stage                          this program
  ---------------------------------------  --------------------------------
  _update_world_AABB_simd (cpp:523)        min/max reduce + hysteresis state
  _points_to_cells_simd   (cpp:837)        quantize -> 2-word row-major cell
                                           keys -> lax.sort (full sort every
                                           step; replaces run-length cells
                                           AND the zsort coherence trick)
  _build_octree_and_gather_leaves_simd     (2W+1)^2 contiguous stencil
    (cpp:1165)                             ranges per point via vectorized
                                           binary search over sorted keys
  _solve_leaves/_brute_force_simd          chunked candidate gather, f32
    (cpp:1823,2400)                        d^2 <= r^2 masking, top-k
                                           compaction into padded-CSR lists

Output layout: for each active ordered pair (set_i, set_j), ``counts``
(n_i,) int32 with the EXACT neighbor count (even past the cap) and ``nbrs``
(n_i, nbr_cap) int32 of set_j-local indices, -1 padded — the static-shape
equivalent of the reference's ``[count, n0, n1, ...]`` records
(``NeighborList.h:8-39``).  Indices are unsorted, like the reference's SIMD
output (the oracle sorts before comparing, ``tests/BruteforceNSearch.cpp:135``).

Semantics matched exactly (validated against the oracle in tests/):
  - inclusive ``d^2 <= r^2`` in float32, evaluated as
    ``(dx*dx + dy*dy) + dz*dz`` (the reference SIMD path is float too,
    ``TreeNSearch.cpp:2478-2483``),
  - self-exclusion by point identity, so coincident points are still
    neighbors of each other (``TreeNSearch.cpp:2068-2069``),
  - variable mode: ``d^2 <= r_i^2``; symmetric adds ``or d^2 <= r_j^2``
    (``TreeNSearch.cpp:2544-2547``),
  - directed active-search matrix over concatenated sets
    (``TreeNSearch.cpp:183-186,322-331``).

The three stages are exposed separately (``sorted_structure`` /
``make_chunk_body`` / ``postprocess``) so the multi-chip path
(``parallel/sharded.py``) can shard the chunk loop over a device mesh while
reusing the exact same per-chunk program.  ``n_pad`` extra trailing points
(used by the sharded path for divisibility padding) are excluded from both
query rows and candidate masks by their original index >= n_real.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..utils import keys as K
from .grid import GridState, update_grid


def _pair_name(si: int, sj: int) -> str:
    return f"{si}-{sj}"


class SortedStructure(NamedTuple):
    """Device state after the sort stage: everything chunk_body needs."""
    hi_s: jnp.ndarray       # (n_total,) sorted key words
    lo_s: jnp.ndarray
    idx_s: jnp.ndarray      # (n_total,) original (global) index per slot
    pts_s: jnp.ndarray      # (n_total, 3)
    set_id_s: jnp.ndarray   # (n_total,)
    r_s: Optional[jnp.ndarray]  # (n_total,) in variable mode
    ijk_s: jnp.ndarray      # (n_total, 3)
    n_cells_xyz: jnp.ndarray  # (3,) grid dims
    r2_fixed: jnp.ndarray   # () fixed-mode radius^2
    offsets_arr: jnp.ndarray  # (n_sets + 1,) set offsets
    n_cells_stat: jnp.ndarray  # () number of occupied cells


def sorted_structure(points: jnp.ndarray,
                     radii: Optional[jnp.ndarray],
                     search_radius: jnp.ndarray,
                     state: GridState,
                     cfg: SearchConfig) -> SortedStructure:
    """Quantize + key + sort.  ``points`` may carry trailing padding rows
    beyond ``cfg.n_points`` (they must duplicate real coordinates so the
    grid box is unaffected; they are masked out downstream)."""
    n_total = points.shape[0]
    inv_cell = 1.0 / state.cell_size
    ijk = K.quantize(points, state.grid_min, inv_cell, state.n_cells)
    hi, lo = K.cell_keys(ijk)
    iota = jnp.arange(n_total, dtype=jnp.int32)
    hi_s, lo_s, idx_s = K.sort_by_2word_key(hi, lo, iota)

    pts_s = points[idx_s]
    set_ids = jnp.asarray(np.repeat(
        np.arange(cfg.n_sets, dtype=np.int32), cfg.set_sizes))
    if n_total > cfg.n_points:
        set_ids = jnp.concatenate([
            set_ids, jnp.full((n_total - cfg.n_points,), -1, jnp.int32)])
    set_id_s = set_ids[idx_s]
    r_s = radii[idx_s] if cfg.variable else None
    ijk_s = K.quantize(pts_s, state.grid_min, inv_cell, state.n_cells)

    if n_total > 1:
        n_cells_stat = 1 + jnp.sum(
            (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]))
    else:
        n_cells_stat = jnp.asarray(n_total, jnp.int32)

    return SortedStructure(
        hi_s=hi_s, lo_s=lo_s, idx_s=idx_s, pts_s=pts_s, set_id_s=set_id_s,
        r_s=r_s, ijk_s=ijk_s, n_cells_xyz=state.n_cells,
        r2_fixed=(search_radius * search_radius).astype(jnp.float32),
        offsets_arr=jnp.asarray(np.asarray(cfg.set_offsets, np.int32)),
        n_cells_stat=jnp.asarray(n_cells_stat, jnp.int32),
    )


def make_chunk_body(s: SortedStructure, cfg: SearchConfig,
                    queries: Optional[dict] = None):
    """Build the per-chunk search function: chunk id -> pair outputs.

    This is the hot loop (role of ``_brute_force_simd``,
    ``TreeNSearch.cpp:2400-2569``): stencil range search, candidate gather,
    distance mask, per-pair top-k compaction.

    ``queries`` (optional) decouples the query points from the sorted
    candidate structure: a dict with ``pts`` (m, 3), ``ijk`` (m, 3),
    ``orig`` (m,), ``set_id`` (m,) and (variable mode) ``r`` (m,).  The
    sharded path uses this to search ONLY the device's owned points while
    candidates include the halo records — without it the chunk loop runs
    over the sorted structure itself (queries == candidates), as in the
    single-device program.
    """
    n_real = cfg.n_points
    n_total = s.hi_s.shape[0]
    n_q = queries["pts"].shape[0] if queries is not None else n_total
    w = cfg.stencil_w
    chunk = cfg.chunk
    cand_cap = cfg.cand_cap
    kx, ky, kz = s.n_cells_xyz[0], s.n_cells_xyz[1], s.n_cells_xyz[2]
    offs_2d = [(di, dj) for di in range(-w, w + 1) for dj in range(-w, w + 1)]
    n_ranges = len(offs_2d)
    slot_t = jnp.arange(cand_cap, dtype=jnp.int32)

    def chunk_body(c):
        base = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        base_c = jnp.minimum(base, n_q - 1)
        if queries is None:
            q_orig_a, q_ijk, q_pts = s.idx_s, s.ijk_s, s.pts_s
            q_set_a, q_r_a = s.set_id_s, s.r_s
        else:
            q_orig_a, q_ijk, q_pts = (queries["orig"], queries["ijk"],
                                      queries["pts"])
            q_set_a, q_r_a = queries["set_id"], queries.get("r")
        my_orig = q_orig_a[base_c]
        row_valid = (base < n_q) & (my_orig < n_real)

        my_i = q_ijk[base_c, 0]
        my_j = q_ijk[base_c, 1]
        my_k = q_ijk[base_c, 2]
        my_pos = q_pts[base_c]
        my_set = q_set_a[base_c]
        my_r2 = (q_r_a[base_c] ** 2) if cfg.variable else None

        # (2W+1)^2 contiguous candidate ranges per point: for each (di, dj)
        # the k-run [k-W, k+W] is one range in row-major key order.
        q_hi, q_valid = [], []
        for (di, dj) in offs_2d:
            ii = my_i + di
            jj = my_j + dj
            q_valid.append((ii >= 0) & (ii < kx) & (jj >= 0) & (jj < ky))
            q_hi.append(K.key_hi(jnp.clip(ii, 0, kx - 1),
                                 jnp.clip(jj, 0, ky - 1)))
        q_hi = jnp.stack(q_hi, axis=1)                      # (chunk, R)
        q_valid = jnp.stack(q_valid, axis=1)
        q_lo_min = jnp.maximum(my_k - w, 0)[:, None].repeat(n_ranges, 1)
        q_lo_max = jnp.minimum(my_k + w, kz - 1)[:, None].repeat(n_ranges, 1)

        starts = K.searchsorted_2word(s.hi_s, s.lo_s, q_hi, q_lo_min, "left")
        ends = K.searchsorted_2word(s.hi_s, s.lo_s, q_hi, q_lo_max, "right")
        lens = jnp.where(q_valid & row_valid[:, None], ends - starts, 0)

        cum = jnp.cumsum(lens, axis=1)                      # inclusive
        total = cum[:, -1]

        # slot t -> (stencil range, offset inside range)
        seg = jnp.sum(slot_t[None, :, None] >= cum[:, None, :], axis=2)
        seg = jnp.minimum(seg, n_ranges - 1)
        prev_end = jnp.where(
            seg > 0,
            jnp.take_along_axis(cum, jnp.maximum(seg - 1, 0), axis=1), 0)
        cand_pos = jnp.take_along_axis(starts, seg, axis=1) \
            + slot_t[None, :] - prev_end
        slot_valid = slot_t[None, :] < jnp.minimum(total, cand_cap)[:, None]
        cand_pos = jnp.clip(cand_pos, 0, n_total - 1)

        c_pos = s.pts_s[cand_pos]                           # (chunk, cap, 3)
        c_orig = s.idx_s[cand_pos]
        c_set = s.set_id_s[cand_pos]

        if cfg.scalar_f64:
            # reference SCALAR parity: the non-SIMD reference loop
            # accumulates d^2 in double (TreeNSearch.cpp:2080-2086);
            # f32 inputs promote exactly, so only the products/sum round
            # (once each, in f64).  Requires jax_enable_x64 upstream
            # (api.set_scalar_double_accum documents the gate).
            cp = c_pos.astype(jnp.float64)
            mp = my_pos.astype(jnp.float64)
            dx = cp[..., 0] - mp[:, None, 0]
            dy = cp[..., 1] - mp[:, None, 1]
            dz = cp[..., 2] - mp[:, None, 2]
        else:
            dx = c_pos[..., 0] - my_pos[:, None, 0]
            dy = c_pos[..., 1] - my_pos[:, None, 1]
            dz = c_pos[..., 2] - my_pos[:, None, 2]
        d2 = (dx * dx + dy * dy) + dz * dz          # fixed add order

        if cfg.variable:
            my_r2c = my_r2.astype(d2.dtype)
            crit = d2 <= my_r2c[:, None]
            if cfg.symmetric:
                c_r = s.r_s[cand_pos].astype(d2.dtype)
                crit = crit | (d2 <= c_r * c_r)
        else:
            crit = d2 <= s.r2_fixed.astype(d2.dtype)
        base_mask = (slot_valid & crit & row_valid[:, None]
                     & (c_orig != my_orig[:, None]) & (c_orig < n_real))

        loc_j = c_orig - s.offsets_arr[jnp.clip(c_set, 0, None)]

        out = {"cand_total": jnp.max(total)}
        k_sel = min(cfg.nbr_cap, cand_cap)
        for (si, sj) in cfg.active_pairs:
            pm = base_mask & (my_set == si)[:, None] & (c_set == sj)
            cnt = jnp.sum(pm, axis=1).astype(jnp.int32)
            score = jnp.where(pm, cand_cap - slot_t[None, :], 0)
            vals, sel = jax.lax.top_k(score, k_sel)
            nbr = jnp.where(vals > 0,
                            jnp.take_along_axis(loc_j, sel, axis=1), -1)
            if k_sel < cfg.nbr_cap:
                nbr = jnp.pad(nbr, ((0, 0), (0, cfg.nbr_cap - k_sel)),
                              constant_values=-1)
            out[_pair_name(si, sj)] = {"counts": cnt, "nbrs": nbr}
        return out

    return chunk_body


def postprocess(mapped: dict, s: SortedStructure, state: GridState,
                cfg: SearchConfig) -> dict:
    """Un-permute per-chunk outputs (sorted order) to original per-set order
    (role of the reference's set-local index rebase,
    ``TreeNSearch.cpp:2011-2017``)."""
    n_total = s.hi_s.shape[0]
    iota = jnp.arange(n_total, dtype=jnp.int32)
    inv_perm = jnp.zeros((n_total,), jnp.int32).at[s.idx_s].set(
        iota, unique_indices=True)
    pairs = {}
    for (si, sj) in cfg.active_pairs:
        name = _pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        cnt_all = mapped[name]["counts"].reshape(-1)
        nbr_all = mapped[name]["nbrs"].reshape(-1, cfg.nbr_cap)
        if n_i > 0:
            rows = jax.lax.dynamic_slice_in_dim(
                inv_perm, cfg.set_offsets[si], n_i)
            counts = cnt_all[rows]
            nbrs = nbr_all[rows]
            max_count = jnp.max(counts)
        else:
            counts = jnp.zeros((0,), jnp.int32)
            nbrs = jnp.zeros((0, cfg.nbr_cap), jnp.int32)
            max_count = jnp.zeros((), jnp.int32)
        pairs[name] = {"counts": counts, "nbrs": nbrs, "max_count": max_count}

    return {
        "pairs": pairs,
        "cand_max": jnp.max(mapped["cand_total"]),
        "n_cells": s.n_cells_stat,
        "error": state.error,
    }


def _empty_solution(cfg: SearchConfig, state: GridState) -> dict:
    pairs = {}
    for (si, sj) in cfg.active_pairs:
        n_i = cfg.set_sizes[si]
        pairs[_pair_name(si, sj)] = {
            "counts": jnp.zeros((n_i,), jnp.int32),
            "nbrs": jnp.full((n_i, cfg.nbr_cap), -1, jnp.int32),
            "max_count": jnp.zeros((), jnp.int32),
        }
    return {
        "pairs": pairs,
        "cand_max": jnp.zeros((), jnp.int32),
        "n_cells": jnp.zeros((), jnp.int32),
        "error": state.error,
    }


def build_and_search(points: jnp.ndarray,
                     radii: Optional[jnp.ndarray],
                     search_radius: jnp.ndarray,
                     cell_size: jnp.ndarray,
                     state: GridState,
                     cfg: SearchConfig) -> tuple[dict, GridState]:
    """Full single-device neighborhood search; all array args are device
    values, ``cfg`` is static."""
    n = cfg.n_points
    state = update_grid(state, points, cell_size)
    if n == 0:
        return _empty_solution(cfg, state), state

    s = sorted_structure(points, radii, search_radius, state, cfg)
    chunk_body = make_chunk_body(s, cfg)
    n_chunks = -(-n // cfg.chunk)
    mapped = jax.lax.map(chunk_body, jnp.arange(n_chunks, dtype=jnp.int32))
    return postprocess(mapped, s, state, cfg), state


@partial(jax.jit, static_argnames=("cfg",))
def build_and_search_jit(points, radii, search_radius, cell_size, state,
                         cfg: SearchConfig):
    return build_and_search(points, radii, search_radius, cell_size, state,
                            cfg)
