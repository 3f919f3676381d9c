"""Multi-chip search over a ``jax.sharding.Mesh`` via ``shard_map``.

The reference is a single-process shared-memory library (SURVEY.md §5: no
distributed backend exists there); its structural analog of scaling is the
ghost-cell octree's overlapping leaves (``TreeNSearch.cpp:1246-1291``).
The TPU-native equivalent built here is a true DOMAIN DECOMPOSITION with
halo exchange over ICI — per-device memory and work are O(N/D + halo), so
multi-chip extends both throughput and the reachable problem size:

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
  local search       two engines:
                     (a) ``build_and_search_sharded_fast`` — the FLAGSHIP
                         dense-table fast path per device: slab-local
                         dense table (``lin_base`` rebases the global
                         linear ids, so cell assignment is bit-identical
                         to single-chip), row-aligned layout, and the
                         tile-window kernel with the owned-row query
                         filter — halo rows serve as candidates only,
                         per-device query count == owned count;
                     (b) ``build_and_search_sharded`` — the search-based
                         reference pipeline (fallback for configs the
                         kernel does not serve), with queries drawn from
                         the owned routing buffer only.
  results            owned results are produced directly in the routing
                     layout and returned to the origin device with a
                     second ``all_to_all``; the fast path routes one
                     block per DISTINCT candidate set (pairs that share
                     set_j share the data, ops/pallas_pairs.py v4)

All exchanged records are INT32-typed: coordinates/radii ride as f32 bit
patterns bitcast into int lanes, indices and set ids as plain ints.  The
reverse layout (ints bitcast into f32 lanes) is UNSOUND on TPU — indices
below 2^23 are f32 denormals and float relayouts flush them to zero
(observed on real hardware at 1M points; CPU-mesh tests cannot catch it) —
so the safe typing is enforced by construction here.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SearchConfig, round_up
from ..ops import fastpath as fp
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


def _route_and_halo(pts_l, rad_l, orig_l, set_l, st, cfg, axis, n_dev, S,
                    n: int, pl_l=None):
    """Shared routing + halo stage: bucket this device's input rows by
    owner slab, ``all_to_all`` them to the owners, then ``ppermute`` the
    owned buffer to both neighbors.  Returns (local records (3L, 8) i32,
    owner, pos, route_overflow, x0) where ``local`` rows [0, L) are the
    owned routing buffer in (sender, slot) order."""
    me = jax.lax.axis_index(axis)
    L0 = pts_l.shape[0]
    L = n_dev * S
    inv_cell = 1.0 / st.cell_size
    kx = st.n_cells[0]
    slab_w = jnp.maximum(-(-kx // n_dev), cfg.stencil_w)

    ijk_l = K.quantize(pts_l, st.grid_min, inv_cell, st.n_cells)
    valid_l = orig_l < n
    owner = jnp.minimum(ijk_l[:, 0] // slab_w, n_dev - 1)
    owner = jnp.where(valid_l, owner, 0)
    # slot within the owner's bucket: stable sort by owner, then rank
    # inside each owner segment
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

    # INT32-typed record rows (see module docstring: ints in f32 lanes
    # would be flushed as denormals on real TPUs)
    sent_row = jnp.zeros((_NF,), jnp.int32).at[_F_ORIG].set(
        jnp.int32(n)).at[_F_SET].set(jnp.int32(-1))
    # fields 6,7: user per-point payload (fused reduce) rides the routed
    # record rows, so halo candidates carry correct p0_j/p1_j for free
    pl0 = _bc_i32(pl_l[:, 0]) if pl_l is not None \
        else jnp.zeros((L0,), jnp.int32)
    pl1 = _bc_i32(pl_l[:, 1]) if pl_l is not None \
        else jnp.zeros((L0,), jnp.int32)
    rec_l = jnp.stack([_bc_i32(pts_l[:, 0]), _bc_i32(pts_l[:, 1]),
                       _bc_i32(pts_l[:, 2]), _bc_i32(rad_l),
                       orig_l, set_l, pl0, pl1], axis=1)
    slot = jnp.where(valid_l & (pos < S), owner * S + pos, L)
    send = jnp.broadcast_to(sent_row, (L + 1, _NF)).at[slot].set(rec_l)
    recv = jax.lax.all_to_all(send[:L].reshape(n_dev, S, _NF), axis,
                              split_axis=0, concat_axis=0, tiled=False)
    mine = recv.reshape(L, _NF)

    # halo exchange: whole neighbor-slab buffers (the stencil reaches at
    # most slab_w cells, i.e. one slab over; wraparound copies are not
    # spatial neighbors -> sentinel them)
    sent_blk = jnp.broadcast_to(sent_row, (L, _NF))
    from_left = jax.lax.ppermute(
        mine, axis, [(d, (d + 1) % n_dev) for d in range(n_dev)])
    from_right = jax.lax.ppermute(
        mine, axis, [(d, (d - 1) % n_dev) for d in range(n_dev)])
    from_left = jnp.where(me > 0, from_left, sent_blk)
    from_right = jnp.where(me < n_dev - 1, from_right, sent_blk)
    local = jnp.concatenate([mine, from_left, from_right], axis=0)
    return local, owner, pos, valid_l, route_overflow, me * slab_w, slab_w


def _origin_views(mapped, cfg, per_pair_key):
    """Assemble per-set outputs in original order from routed-back
    (owner, slot) buffers (they line up with the input layout)."""
    pairs = {}
    for (si, sj) in cfg.active_pairs:
        name = pl._pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        src = mapped[per_pair_key(si, sj)]
        if n_i > 0:
            counts = jax.lax.dynamic_slice_in_dim(
                src["counts"], cfg.set_offsets[si], n_i)
            nbrs = jax.lax.dynamic_slice_in_dim(
                src["nbrs"], cfg.set_offsets[si], n_i)
            max_count = jnp.max(counts)
        else:
            counts = jnp.zeros((0,), jnp.int32)
            nbrs = jnp.zeros((0,) + src["nbrs"].shape[1:], jnp.int32)
            max_count = jnp.zeros((), jnp.int32)
        pairs[name] = {"counts": counts, "nbrs": nbrs,
                       "max_count": max_count}
    return pairs


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
    """Sharded search through the reference pipeline (fallback engine).

    ``points``/``radii`` are global arrays (any sharding); outputs match
    the single-device program exactly (same counts, same neighbor sets).
    Queries are the device's OWNED routing buffer only (halo records are
    candidates, never queries).  The returned solution carries
    ``route_overflow`` — nonzero means the fixed routing-bucket cap was
    exceeded (rerun with a larger ``route_slack``).
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
    S = round_up(max(8, int(route_slack
                         * (n / (n_dev * n_dev) + 64))), 8)
    L = n_dev * S                    # owned-record capacity per device
    Lc = 3 * L                       # owned + two neighbor-slab halos
    chunk = cfg.chunk
    n_chunks_local = -(-L // chunk)  # queries: owned rows only

    pts_in = _pad_rows(points, n_in - n)
    rad_in = _pad_rows(radii, n_in - n) if cfg.variable \
        else jnp.zeros((n_in,), jnp.float32)
    orig_in = jnp.arange(n_in, dtype=jnp.int32)       # >= n marks padding
    set_np = np.repeat(np.arange(cfg.n_sets, dtype=np.int32),
                       cfg.set_sizes)
    set_in = jnp.asarray(np.concatenate(
        [set_np, np.full(n_in - n, -1, np.int32)]))

    def device_program(pts_l, rad_l, orig_l, set_l, st):
        local, owner, pos, valid_l, route_overflow, _x0, _sw = \
            _route_and_halo(pts_l, rad_l, orig_l, set_l, st, cfg, axis,
                            n_dev, S, n)
        inv_cell = 1.0 / st.cell_size

        # ---- local sorted structure (owned + halo candidates) ---------
        orig_a = local[:, _F_ORIG]
        valid_a = orig_a < n
        pts_a = _bc_f32(local[:, :3])
        ijk_a = K.quantize(pts_a, st.grid_min, inv_cell, st.n_cells)
        hi, lo = K.cell_keys(ijk_a)
        hi = jnp.where(valid_a, hi, jnp.int32(np.iinfo(np.int32).max))
        hi_s, lo_s, perm = K.sort_by_2word_key(
            hi, lo, jnp.arange(Lc, dtype=jnp.int32))
        local_s = local[perm]
        s = pl.SortedStructure(
            hi_s=hi_s, lo_s=lo_s,
            idx_s=local_s[:, _F_ORIG],
            pts_s=_bc_f32(local_s[:, :3]),
            set_id_s=local_s[:, _F_SET],
            r_s=_bc_f32(local_s[:, _F_R]) if cfg.variable else None,
            ijk_s=ijk_a[perm],
            n_cells_xyz=st.n_cells,
            r2_fixed=(search_radius * search_radius).astype(jnp.float32),
            offsets_arr=jnp.asarray(np.asarray(cfg.set_offsets, np.int32)),
            n_cells_stat=jnp.zeros((), jnp.int32),
        )

        # ---- chunked stencil search, OWNED queries only ---------------
        mine = local[:L]
        queries = {
            "pts": _bc_f32(mine[:, :3]),
            "ijk": K.quantize(_bc_f32(mine[:, :3]), st.grid_min,
                              inv_cell, st.n_cells),
            "orig": mine[:, _F_ORIG],
            "set_id": mine[:, _F_SET],
        }
        if cfg.variable:
            queries["r"] = _bc_f32(mine[:, _F_R])
        body = pl.make_chunk_body(s, cfg, queries=queries)
        mapped = jax.lax.map(
            body, jnp.arange(n_chunks_local, dtype=jnp.int32))

        # ---- route results back to the origin devices -----------------
        # owned queries are already in (owner, slot) routing order, so
        # the outputs line up with the buffers directly — no scatter
        out = {"route_overflow": route_overflow[None],
               "cand_total": jnp.max(mapped["cand_total"])[None]}
        for (si, sj) in cfg.active_pairs:
            name = pl._pair_name(si, sj)
            cnt_flat = mapped[name]["counts"].reshape(-1)[:L]
            nbr_flat = mapped[name]["nbrs"].reshape(-1, cfg.nbr_cap)[:L]
            ret_c = jax.lax.all_to_all(cnt_flat.reshape(n_dev, S),
                                       axis, split_axis=0, concat_axis=0,
                                       tiled=False).reshape(L)
            ret_n = jax.lax.all_to_all(
                nbr_flat.reshape(n_dev, S, cfg.nbr_cap), axis,
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

    pairs = _origin_views(mapped, cfg, pl._pair_name)
    solution = {
        "pairs": pairs,
        "cand_max": jnp.max(mapped["cand_total"]),
        "n_cells": jnp.zeros((), jnp.int32),
        "error": state.error,
        "route_overflow": jnp.max(mapped["route_overflow"]),
    }
    return solution, state


def build_and_search_sharded_fast(points: jnp.ndarray,
                                  radii: Optional[jnp.ndarray],
                                  search_radius: jnp.ndarray,
                                  cell_size: jnp.ndarray,
                                  state: GridState,
                                  cfg: SearchConfig,
                                  mesh: Mesh,
                                  knobs: "fp.FastKnobs",
                                  axis: str = "d",
                                  route_slack: float = 2.5,
                                  reduce_spec=None,
                                  payload: Optional[jnp.ndarray] = None,
                                  ) -> tuple[dict, GridState]:
    """Sharded search through the FLAGSHIP dense-table fast engine.

    Each device builds the fast path's structures over its slab + halos:
    the global linear cell ids are rebased by ``lin_base`` so the dense
    table spans only the local i-window (O(local cells) memory), and the
    owned-row query filter marks halo-row tiles skip — the kernel's query
    work is exactly the owned points (VERDICT r2 item 4).  Cell
    assignment uses the GLOBAL grid origin, so neighbor sets are
    bit-identical to the single-device fast path.

    ``knobs`` sizes the PER-DEVICE caps (dense/tiles/rows are local);
    ``knobs.interpret=True`` runs the kernel in the Pallas interpreter
    (CPU-mesh tests); on real TPUs the Mosaic kernel runs per device
    under ``shard_map``.
    """
    n = cfg.n_points
    n_dev = mesh.shape[axis]
    # the sharded prep keeps the row-tile layout (the brick layout's
    # owned-row query filter is not wired); rec_expand passes through:
    # the expand build sorts the slab-local records by the same masked
    # cell keys as the prep (stable sort => identical permutation), the
    # window descriptors ride sorted space (fastpath win_sorted) and the
    # pair kernels DMA candidate windows from the sorted rows — the same
    # two round-4/5 wins the single-chip engine has.
    # owned-row query filter is not wired yet)
    knobs = knobs._replace(brick=())
    state = update_grid(state, points, cell_size)
    if n == 0:
        sol = pl._empty_solution(cfg, state)
        sol["route_overflow"] = jnp.zeros((), jnp.int32)
        return sol, state

    L0 = -(-n // n_dev)
    n_in = L0 * n_dev
    S = round_up(max(8, int(route_slack
                         * (n / (n_dev * n_dev) + 64))), 8)
    L = n_dev * S
    Lc = 3 * L
    w = cfg.stencil_w
    cand_sets = tuple(sorted({sj for (_, sj) in cfg.active_pairs}))
    cand_offsets = tuple(cfg.set_offsets[sj] for sj in cand_sets)
    caps = cfg.nbr_caps if cfg.nbr_caps is not None \
        else (cfg.nbr_cap,) * cfg.n_sets
    k8s = {sj: -(-caps[sj] // 8) * 8 for sj in cand_sets}
    # per-device local shapes ride through a device-count-sized cfg
    # nbr_caps rides with GLOBAL set indexing (the kernel's per-block caps
    # are looked up by the global sj values in cand_sets)
    local_cfg = SearchConfig(
        set_sizes=(Lc,), active_pairs=((0, 0),),
        variable=cfg.variable, symmetric=cfg.symmetric,
        stencil_w=w, chunk=cfg.chunk, cand_cap=cfg.cand_cap,
        nbr_cap=cfg.nbr_cap, nbr_caps=tuple(caps))

    pts_in = _pad_rows(points, n_in - n)
    rad_in = _pad_rows(radii, n_in - n) if cfg.variable \
        else jnp.zeros((n_in,), jnp.float32)
    orig_in = jnp.arange(n_in, dtype=jnp.int32)
    set_np = np.repeat(np.arange(cfg.n_sets, dtype=np.int32),
                       cfg.set_sizes)
    set_in = jnp.asarray(np.concatenate(
        [set_np, np.full(n_in - n, -1, np.int32)]))
    pl_in = _pad_rows(payload, n_in - n) if payload is not None else None

    def device_program(pts_l, rad_l, orig_l, set_l, st, pl_l=None):
        local, owner, pos, valid_l, route_overflow, x0, slab_w = \
            _route_and_halo(pts_l, rad_l, orig_l, set_l, st, cfg, axis,
                            n_dev, S, n, pl_l=pl_l)
        me = jax.lax.axis_index(axis)
        kx = st.n_cells[0]
        ky, kz = st.n_cells[1], st.n_cells[2]
        dy, dz = ky + 2 * w, kz + 2 * w

        pts_a = _bc_f32(local[:, :3])
        rad_a = _bc_f32(local[:, _F_R]) if cfg.variable else None
        orig_a = local[:, _F_ORIG]
        set_a = local[:, _F_SET]
        valid_a = orig_a < n

        # slab-local dense window: padded rows [base_i_pad, ...); the
        # local i-span covers owned + both halo slabs (+ stencil pad)
        base_i_pad = jnp.maximum(x0 - slab_w + w, 0)
        span_i = jnp.minimum(x0 + 2 * slab_w, kx) + w + w - base_i_pad
        lin_base = base_i_pad * dy * dz
        # owned range in rebased padded row-i units
        hi_cell = jnp.where(me == n_dev - 1, kx, x0 + slab_w)
        owned_lo = x0 + w - base_i_pad
        owned_hi = hi_cell + w - base_i_pad

        carry = fp._pallas_prep(
            pts_a, rad_a, st, local_cfg, knobs, valid=valid_a,
            owned_rng=(owned_lo, owned_hi), lin_base=lin_base,
            span_i=span_i)
        sol = fp._pallas_search(
            pts_a, rad_a, search_radius, st, carry, local_cfg, knobs,
            set_ids_data=set_a, orig_ids=orig_a, sentinel_orig=n,
            cand_sets=cand_sets, cand_offsets=cand_offsets,
            multi_set=cfg.n_sets > 1, raw=True,
            reduce_spec=reduce_spec,
            payload=_bc_f32(local[:, 6:8]) if pl_l is not None else None,
            # the local cfg sees one set; the records carry GLOBAL
            # data-driven set ids, so the kernel's active-matrix mask
            # needs the GLOBAL pairs
            reduce_active=cfg.active_pairs)

        # owned rows [0, L) of `local` -> padded slots -> tier select
        ppos = carry.qpos[:L]
        t_i, lane = ppos // 128, ppos % 128
        fs = carry.fat_slot[t_i]
        out = {"route_overflow": route_overflow[None],
               "flags": jnp.stack([
                   sol["tile_overflow"], sol["rows_overflow"],
                   sol["dense_overflow"], sol["cand_max"],
                   sol["pre_surv_max"], sol["pre_surv_edge_max"]])[None]}
        mine_valid = local[:L, _F_ORIG] < n
        gidx = jnp.where(valid_l & (pos < S), owner * S + pos, 0)
        if reduce_spec is not None:
            # fused reduce: gather each owned row's accumulators from the
            # merged tile layout, zero invalid rows, and route them home
            # with the same all_to_all + origin gather as the counts
            vals = sol["reduce_flat"][:, ppos].T      # (L, n_out)
            vals = jnp.where(mine_valid[:, None], vals, 0.0)
            ret = jax.lax.all_to_all(
                vals.reshape(n_dev, S, reduce_spec.n_out), axis,
                split_axis=0, concat_axis=0,
                tiled=False).reshape(L, reduce_spec.n_out)
            out["reduce"] = jnp.where(valid_l[:, None], ret[gidx], 0.0)
            return out
        for b, sj in enumerate(cand_sets):
            blkj = sol["blocks"][sj]
            counts_l = jnp.where(mine_valid, blkj["counts_flat"][ppos], 0)
            flat_n = jnp.transpose(blkj["nbrs_tiles"],
                                   (0, 2, 1)).reshape(-1, k8s[sj])
            flat_f = jnp.transpose(blkj["nbrs_fat"],
                                   (0, 2, 1)).reshape(-1, k8s[sj])
            nbrs_l = jnp.where(
                (fs >= 0)[:, None],
                flat_f[jnp.maximum(fs, 0) * 128 + lane],
                flat_n[ppos])
            ret_c = jax.lax.all_to_all(counts_l.reshape(n_dev, S),
                                       axis, split_axis=0, concat_axis=0,
                                       tiled=False).reshape(L)
            ret_n = jax.lax.all_to_all(
                nbrs_l.reshape(n_dev, S, k8s[sj]), axis,
                split_axis=0, concat_axis=0,
                tiled=False).reshape(L, k8s[sj])
            out[f"cs{sj}"] = {
                "counts": jnp.where(valid_l, ret_c[gidx], 0),
                "nbrs": jnp.where(valid_l[:, None], ret_n[gidx], -1),
            }
        return out

    in_specs = (P(axis), P(axis), P(axis), P(axis), P())
    ops = (pts_in, rad_in, orig_in, set_in, state)
    if pl_in is not None:
        in_specs = in_specs + (P(axis),)
        ops = ops + (pl_in,)
    out_specs = {"route_overflow": P(axis), "flags": P(axis)}
    if reduce_spec is not None:
        out_specs["reduce"] = P(axis)
    else:
        for sj in cand_sets:
            out_specs[f"cs{sj}"] = {"counts": P(axis), "nbrs": P(axis)}
    mapped = jax.shard_map(
        device_program, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*ops)

    flags = jnp.max(mapped["flags"], axis=0)
    if reduce_spec is not None:
        red_all = mapped["reduce"]           # (n_in, n_out), origin order
        red = {}
        for si in range(cfg.n_sets):
            off = cfg.set_offsets[si]
            red[f"s{si}"] = red_all[off:off + cfg.set_sizes[si]].T
        solution = {
            "reduce": red,
            "pairs": {},
            "cand_max": flags[3],
            "n_cells": jnp.zeros((), jnp.int32),
            "error": state.error,
            "route_overflow": jnp.max(mapped["route_overflow"]),
            "tile_overflow": flags[0],
            "rows_overflow": flags[1],
            "dense_overflow": flags[2],
            "pre_surv_max": flags[4],
            "pre_surv_edge_max": flags[5],
            "pallas_used": jnp.ones((), jnp.int32),
        }
        return solution, state

    pairs = _origin_views(mapped, cfg, lambda si, sj: f"cs{sj}")
    solution = {
        "pairs": pairs,
        "cand_max": flags[3],
        "n_cells": jnp.zeros((), jnp.int32),
        "error": state.error,
        "route_overflow": jnp.max(mapped["route_overflow"]),
        "tile_overflow": flags[0],
        "rows_overflow": flags[1],
        "dense_overflow": flags[2],
        "pre_surv_max": flags[4],
        "pre_surv_edge_max": flags[5],
        "pallas_used": jnp.ones((), jnp.int32),
    }
    return solution, state


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "route_slack"))
def build_and_search_sharded_jit(points, radii, search_radius, cell_size,
                                 state, cfg: SearchConfig, mesh: Mesh,
                                 axis: str = "d", route_slack: float = 2.5):
    return build_and_search_sharded(points, radii, search_radius, cell_size,
                                    state, cfg, mesh, axis, route_slack)


@partial(jax.jit,
         static_argnames=("cfg", "knobs", "mesh", "axis", "route_slack"))
def build_and_search_sharded_fast_jit(points, radii, search_radius,
                                      cell_size, state, cfg: SearchConfig,
                                      mesh: Mesh, knobs: "fp.FastKnobs",
                                      axis: str = "d",
                                      route_slack: float = 2.5):
    return build_and_search_sharded_fast(points, radii, search_radius,
                                         cell_size, state, cfg, mesh, knobs,
                                         axis, route_slack)


@partial(jax.jit,
         static_argnames=("cfg", "knobs", "mesh", "axis", "route_slack",
                          "reduce_spec"))
def build_and_search_sharded_reduce_jit(points, radii, search_radius,
                                        cell_size, state,
                                        cfg: SearchConfig,
                                        mesh: Mesh, knobs: "fp.FastKnobs",
                                        reduce_spec,
                                        axis: str = "d",
                                        route_slack: float = 2.5,
                                        payload=None):
    """Sharded fused neighbor-reduce (see fastpath.ReduceSpec): each
    device folds the visitor over its owned queries' exact neighbor
    sets and the per-point accumulators route home with the counts'
    all_to_all pattern.  ``payload`` ((n, 2) f32 per-point columns)
    rides the routed record rows, so halo candidates see it too."""
    return build_and_search_sharded_fast(points, radii, search_radius,
                                         cell_size, state, cfg, mesh, knobs,
                                         axis, route_slack,
                                         reduce_spec=reduce_spec,
                                         payload=payload)


def make_sharded_step(cfg: SearchConfig, mesh: Mesh, cell_size: float,
                      search_radius: float = 0.0, axis: str = "d",
                      knobs: Optional["fp.FastKnobs"] = None,
                      fast: bool = False):
    """Jitted multi-chip step: (state, points, radii) -> (solution, state).
    ``fast=True`` shards the dense-table fast engine (requires knobs)."""

    @partial(jax.jit, static_argnames=())
    def step(state, points, radii=None):
        if fast:
            return build_and_search_sharded_fast(
                points, radii, jnp.float32(search_radius),
                jnp.float32(cell_size), state, cfg, mesh, knobs, axis)
        return build_and_search_sharded(
            points, radii, jnp.float32(search_radius),
            jnp.float32(cell_size), state, cfg, mesh, axis)

    return step
