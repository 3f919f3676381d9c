"""Multi-chip search over a ``jax.sharding.Mesh`` via ``shard_map``.

The reference is a single-process shared-memory library (SURVEY.md §5: no
distributed backend exists there); its structural analog of scaling is the
ghost-cell octree's overlapping leaves (``TreeNSearch.cpp:1246-1291``).
The TPU-native equivalent built here is a true DOMAIN DECOMPOSITION with
halo exchange over ICI — per-device memory and work are O(N/D + halo), so
multi-chip extends both throughput and the reachable problem size (unlike
the r1 design, which all_gather-replicated the build on every device):

  stage              mechanism
  -----------------  ---------------------------------------------------
  world AABB         global min/max reduce under GSPMD (tiny)
  ownership          the grid's x-axis is split into D i-slabs of
                     ``slab_w = max(ceil(kx/D), stencil_w)`` cell columns
                     (the floor keeps every query's stencil within the
                     two adjacent slabs even on thin grids)
  routing            each device buckets its input points by owner and
                     exchanges fixed-cap (D, S, 8) record buffers with
                     ``lax.all_to_all``; S overflow raises a device flag
                     (``route_overflow``) for the host to regrow
  halo exchange      each device ``lax.ppermute``s its owned buffer to
                     its +1/-1 neighbors (wraparound copies are replaced
                     by sentinels) — the ghost-cell overlap of the
                     reference octree, expressed as slab halos
  local build        per-device 2-word-key sort of owned + halo records
                     (O(N/D) points), then the standard chunked stencil
                     search (``ops.pipeline.make_chunk_body``) — queries
                     are the owned points, halos serve as candidates
  results            per-pair counts/neighbor rows are scattered back to
                     the (owner, slot) routing layout and returned to the
                     origin device with a second ``all_to_all``, so the
                     output shards line up with the caller's input order

Records ride as 8 float32 lanes (x, y, z, r, orig, set, -, -) with the
original index and set id as int32 BIT PATTERNS; sentinel slots carry
orig = n, which every downstream mask already excludes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SearchConfig, round_up
from ..ops import pipeline as pl
from ..ops.grid import GridState, update_grid
from ..utils import keys as K

_F_X, _F_Y, _F_Z, _F_R, _F_ORIG, _F_SET = 0, 1, 2, 3, 4, 5
_NF = 8


def _pad_rows(arr: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == 0:
        return arr
    pad = jnp.broadcast_to(arr[:1], (n_pad,) + arr.shape[1:])
    return jnp.concatenate([arr, pad], axis=0)


def _bc_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _bc_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def build_and_search_sharded(points: jnp.ndarray,
                             radii: Optional[jnp.ndarray],
                             search_radius: jnp.ndarray,
                             cell_size: jnp.ndarray,
                             state: GridState,
                             cfg: SearchConfig,
                             mesh: Mesh,
                             axis: str = "d",
                             route_slack: float = 2.5) -> tuple[dict,
                                                                GridState]:
    """Sharded equivalent of ``ops.pipeline.build_and_search``.

    ``points``/``radii`` are global arrays (any sharding); outputs match
    the single-device program exactly (same counts, same neighbor sets).
    The returned solution additionally carries ``route_overflow`` — a
    nonzero value means the fixed routing-bucket cap was exceeded (rerun
    with a larger ``route_slack``).
    """
    n = cfg.n_points
    n_dev = mesh.shape[axis]
    state = update_grid(state, points, cell_size)
    if n == 0:
        sol = pl._empty_solution(cfg, state)
        sol["route_overflow"] = jnp.zeros((), jnp.int32)
        return sol, state

    L0 = -(-n // n_dev)              # input rows per device
    n_in = L0 * n_dev
    # routing bucket cap per (sender, owner); expected load is n/D^2
    S = round_up(max(64, int(route_slack * n / (n_dev * n_dev)) + 64), 8)
    L = n_dev * S                    # owned-record capacity per device
    Lc = 3 * L                       # owned + two neighbor-slab halos
    chunk = cfg.chunk
    n_chunks_local = -(-Lc // chunk)

    pts_in = _pad_rows(points, n_in - n)
    rad_in = _pad_rows(radii, n_in - n) if cfg.variable \
        else jnp.zeros((n_in,), jnp.float32)
    orig_in = jnp.arange(n_in, dtype=jnp.int32)       # >= n marks padding
    set_np = np.repeat(np.arange(cfg.n_sets, dtype=np.int32),
                       cfg.set_sizes)
    set_in = jnp.asarray(np.concatenate(
        [set_np, np.full(n_in - n, -1, np.int32)]))

    sent_row = jnp.zeros((_NF,), jnp.float32).at[_F_ORIG].set(
        _bc_f32(jnp.int32(n))).at[_F_SET].set(_bc_f32(jnp.int32(-1)))

    def device_program(pts_l, rad_l, orig_l, set_l, st):
        me = jax.lax.axis_index(axis)
        inv_cell = 1.0 / st.cell_size
        kx = st.n_cells[0]
        slab_w = jnp.maximum(-(-kx // n_dev), cfg.stencil_w)

        # ---- ownership + routing ------------------------------------
        ijk_l = K.quantize(pts_l, st.grid_min, inv_cell, st.n_cells)
        valid_l = orig_l < n
        owner = jnp.minimum(ijk_l[:, 0] // slab_w, n_dev - 1)
        owner = jnp.where(valid_l, owner, 0)
        # slot within the owner's bucket: stable sort by owner, then
        # rank inside each owner segment
        o_sorted, lidx = jax.lax.sort(
            (jnp.where(valid_l, owner, n_dev),
             jnp.arange(L0, dtype=jnp.int32)), num_keys=1, is_stable=True)
        seg_start = jnp.searchsorted(
            o_sorted, jnp.arange(n_dev, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        pos_sorted = jnp.arange(L0, dtype=jnp.int32) - seg_start[
            jnp.minimum(o_sorted, n_dev - 1)]
        pos = jnp.zeros((L0,), jnp.int32).at[lidx].set(pos_sorted)
        route_overflow = jnp.any(valid_l & (pos >= S)).astype(jnp.int32)

        rec_l = jnp.stack([pts_l[:, 0], pts_l[:, 1], pts_l[:, 2], rad_l,
                           _bc_f32(orig_l), _bc_f32(set_l),
                           jnp.zeros((L0,), jnp.float32),
                           jnp.zeros((L0,), jnp.float32)], axis=1)
        slot = jnp.where(valid_l & (pos < S), owner * S + pos, L)
        send = jnp.broadcast_to(sent_row, (L + 1, _NF)).at[slot].set(rec_l)
        recv = jax.lax.all_to_all(send[:L].reshape(n_dev, S, _NF), axis,
                                  split_axis=0, concat_axis=0, tiled=False)
        mine = recv.reshape(L, _NF)

        # ---- halo exchange: whole neighbor-slab buffers ---------------
        # (the stencil reaches at most slab_w cells, i.e. one slab over;
        # wraparound copies are not spatial neighbors -> sentinel them)
        sent_blk = jnp.broadcast_to(sent_row, (L, _NF))
        from_left = jax.lax.ppermute(
            mine, axis, [(d, (d + 1) % n_dev) for d in range(n_dev)])
        from_right = jax.lax.ppermute(
            mine, axis, [(d, (d - 1) % n_dev) for d in range(n_dev)])
        from_left = jnp.where(me > 0, from_left, sent_blk)
        from_right = jnp.where(me < n_dev - 1, from_right, sent_blk)
        local = jnp.concatenate([mine, from_left, from_right], axis=0)

        # ---- local sorted structure (owned + halo) --------------------
        orig_a = _bc_i32(local[:, _F_ORIG])
        valid_a = orig_a < n
        ijk_a = K.quantize(local[:, :3], st.grid_min, inv_cell, st.n_cells)
        hi, lo = K.cell_keys(ijk_a)
        hi = jnp.where(valid_a, hi, jnp.int32(np.iinfo(np.int32).max))
        hi_s, lo_s, perm = K.sort_by_2word_key(
            hi, lo, jnp.arange(Lc, dtype=jnp.int32))
        local_s = local[perm]
        s = pl.SortedStructure(
            hi_s=hi_s, lo_s=lo_s,
            idx_s=_bc_i32(local_s[:, _F_ORIG]),
            pts_s=local_s[:, :3],
            set_id_s=_bc_i32(local_s[:, _F_SET]),
            r_s=local_s[:, _F_R] if cfg.variable else None,
            ijk_s=ijk_a[perm],
            n_cells_xyz=st.n_cells,
            r2_fixed=(search_radius * search_radius).astype(jnp.float32),
            offsets_arr=jnp.asarray(np.asarray(cfg.set_offsets, np.int32)),
            n_cells_stat=jnp.zeros((), jnp.int32),
        )

        # ---- chunked stencil search over the local slab ----------------
        body = pl.make_chunk_body(s, cfg)
        mapped = jax.lax.map(
            body, jnp.arange(n_chunks_local, dtype=jnp.int32))

        # ---- route results back to the origin devices ------------------
        # sorted slot -> routing slot (owned records are slots < L of
        # `local`; halo/sentinel rows fall into the trash row L)
        src_s = jnp.where(perm < L, perm, L)
        out = {"route_overflow": route_overflow[None],
               "cand_total": jnp.max(mapped["cand_total"])[None]}
        for (si, sj) in cfg.active_pairs:
            name = pl._pair_name(si, sj)
            cnt_flat = mapped[name]["counts"].reshape(-1)[:Lc]
            nbr_flat = mapped[name]["nbrs"].reshape(-1, cfg.nbr_cap)[:Lc]
            back_c = jnp.zeros((L + 1,), jnp.int32).at[src_s].set(cnt_flat)
            back_n = jnp.full((L + 1, cfg.nbr_cap), -1,
                              jnp.int32).at[src_s].set(nbr_flat)
            ret_c = jax.lax.all_to_all(back_c[:L].reshape(n_dev, S),
                                       axis, split_axis=0, concat_axis=0,
                                       tiled=False).reshape(L)
            ret_n = jax.lax.all_to_all(
                back_n[:L].reshape(n_dev, S, cfg.nbr_cap), axis,
                split_axis=0, concat_axis=0, tiled=False
            ).reshape(L, cfg.nbr_cap)
            # (owner, pos) -> this device's input order
            gidx = jnp.where(valid_l & (pos < S), owner * S + pos, 0)
            out[name] = {
                "counts": jnp.where(valid_l, ret_c[gidx], 0),
                "nbrs": jnp.where(valid_l[:, None], ret_n[gidx], -1),
            }
        return out

    in_specs = (P(axis), P(axis), P(axis), P(axis), P())
    out_specs = {"route_overflow": P(axis), "cand_total": P(axis)}
    for (si, sj) in cfg.active_pairs:
        out_specs[pl._pair_name(si, sj)] = {"counts": P(axis),
                                            "nbrs": P(axis)}
    mapped = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(pts_in, rad_in, orig_in, set_in, state)

    # ---- per-set views in original order (no unpermute needed: results
    # returned to the routing origin line up with the input layout) -----
    pairs = {}
    for (si, sj) in cfg.active_pairs:
        name = pl._pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        if n_i > 0:
            counts = jax.lax.dynamic_slice_in_dim(
                mapped[name]["counts"], cfg.set_offsets[si], n_i)
            nbrs = jax.lax.dynamic_slice_in_dim(
                mapped[name]["nbrs"], cfg.set_offsets[si], n_i)
            max_count = jnp.max(counts)
        else:
            counts = jnp.zeros((0,), jnp.int32)
            nbrs = jnp.zeros((0, cfg.nbr_cap), jnp.int32)
            max_count = jnp.zeros((), jnp.int32)
        pairs[name] = {"counts": counts, "nbrs": nbrs,
                       "max_count": max_count}

    solution = {
        "pairs": pairs,
        "cand_max": jnp.max(mapped["cand_total"]),
        "n_cells": jnp.zeros((), jnp.int32),
        "error": state.error,
        "route_overflow": jnp.max(mapped["route_overflow"]),
    }
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
