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
     ``lin``, empty cells backfilled with the next occupied cell's start.
     A stencil range is then two gathers.  The grid is padded by the
     stencil half-width W on every side so boundary cells need no
     clamping (the role of the reference octree's ghost cells,
     ``TreeNSearch.cpp:1211-1220``, re-imagined as table padding).
  2. Points are sorted by the *linear* padded cell id (single int32 key,
     row-major), so each stencil (di, dj) row is one contiguous range.
  3. The PALLAS path (the throughput engine; see ops/pallas_pairs.py)
     lays queries out ROW-ALIGNED — every occupied grid row padded to a
     multiple of 128 slots — so each 128-query tile sits in one grid row
     and each (di, dj) maps to exactly one contiguous, provably disjoint
     candidate window; window descriptors (start/len per window) are
     computed here and DMA'd by the kernel.  In variable mode, per-row /
     per-tile max radii shrink each tile's reach (the reference's
     per-node ghost width, ``TreeNSearch.cpp:1457-1466``).
  4. The XLA tile path (fallback for sparse domains / many pairs /
     CPU) consumes the SAME row-aligned layout + window descriptors as
     the kernel, with plain XLA dynamic slices and ``utils/compact.py``
     row compaction — the TPU equivalent of the reference's AVX2 LUT
     compaction (``TreeNSearch.cpp:2486-2492``).

Static caps (dense table size, window caps, fat-tile list, tile slots,
neighbor cap) carry overflow flags; the host grows them and re-runs
(recompile-on-overflow).  When the domain is too sparse for a dense
table, the host falls back to ``ops/pipeline.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..utils import keys as K
from ..utils.compact import compact_rows
from .grid import GridState, update_grid
from .pipeline import _empty_solution, _pair_name


# sort-compacted dense-table build when n > dense_cap (see _cell_table);
# env A/B switch, read once at import (part of no jit cache key)
DEFAULT_TABLE_SORT = os.environ.get("TNS_TABLE_SORT", "1") == "1"


class FastKnobs(NamedTuple):
    """Static performance knobs for the fast path.

    Field defaults are the single source of truth: ``TreeNSearch.__init__``
    seeds its knobs from here so a step fn built without settling caps and
    the engine's first ``run()`` agree.
    """
    tile: int = 128        # query points per tile
    group: int = 8         # tiles per lax.map iteration (vmapped)
    wcap: int = 288        # max points per stencil-row window (measured 1M)
    dense_cap: int = 1 << 22  # dense cell-table slots
    use_pallas: bool = False   # fused Pallas pair kernel (ops/pallas_pairs)
    pre_cap: int = 48          # center-window pre-compaction width (pallas)
    interpret: bool = False    # pallas interpreter mode (CPU tests)
    fat_wcap: int = 1024       # window cap of the fat tier
    fat_cap: int = 1024        # max tiles handled by the fat tier
    tiles_cap: int = 0         # row-aligned tile slots (0 = auto from n)
    pack: int = 1              # record points per 128-lane row (1/2/4/8/16)
    pre_edge: int = 24         # edge-window pre-compaction width (pallas)
    tps: int = 2               # narrow-tier tiles per pallas grid step
    rows_cap: int = 0          # grid-row array slots (0 = auto)
    mxu_prefix: bool = True    # MXU tril-matmul prefix counts (measured +)
    packed_carry: bool = False  # 1-roll packed compaction (measured -)
    phase_prefix: bool = True   # per-phase MXU prefixes (1/pack the MACs;
    #                            measured -12 ms/step at 1M, probe_r4a)
    rec_wide: bool = False     # one wide (lane-padded) record gather
    #                            instead of narrow gather + lane pad
    lane_batch: bool = False   # v5 lane-batched kernel: one contiguous
    #                            window buffer, one prefix matmul per
    #                            phase, one compaction network per block
    #                            (amortizes per-window fixed costs 9x;
    #                            benchmarks/probe_r5a/b)
    rec_expand: bool = False   # build rec_pad/q_t by the expand KERNEL
    #                            (contiguous DMA copies from sort-carried
    #                            records) instead of the (NPAD, 8) row
    #                            gather + transpose — the gathers cost
    #                            ~22.6 ms at 1M / ~220 ms at 10M
    #                            (benchmarks/probe_r7a.out P3+S5).
    shared_compact: bool = True  # multi-set lane_batch: ONE combined
    #                            staging compaction over all candidate
    #                            sets (packed set|orig values) + cheap
    #                            per-block extraction from the staged
    #                            buffer, instead of a full-volume network
    #                            per block — the dominant kernel term at
    #                            10M x 3 sets.  Auto-disabled when the
    #                            packed int32 encoding cannot hold
    #                            (n_sets, n_points) or in raw/sharded
    #                            mode (global indices of unknown bound).
    brick: tuple = ()          # v6 BRICK tiles: () = row-aligned tiles,
    #                            (BI, BJ, BK) = queries grouped by compact
    #                            cell bricks of BI x BJ x BK cells.  A
    #                            row tile's queries span ~16 cells of one
    #                            grid row, so every query pays the whole
    #                            tile's candidate reach; a brick tile's
    #                            queries share a compact 3-D neighborhood
    #                            and the per-query candidate volume drops
    #                            ~2-3x (the kernel is element-bound after
    #                            v5 amortized the per-window fixed costs,
    #                            benchmarks/probe_r5a).  Requires
    #                            lane_batch; candidates stay in plain
    #                            sorted order (windows are exact k-runs,
    #                            no row padding) while queries get their
    #                            own brick-padded layout.
    split_stage: bool = False  # two-PASS kernel: a mask-mode pass 1
    #                            computes the pair masks and stores them
    #                            bit-packed in tile layout; a pass-2
    #                            kernel (stage_from_bits) unpacks them
    #                            and runs the staging compaction + merge.
    #                            Trades one bits store+load for the
    #                            ~25 ms/step Mosaic scheduling
    #                            interaction between the mask pipeline
    #                            and the staging network (NOTES.md r5) —
    #                            measured NOT to pay at 1M on v5e (the
    #                            network's in-situ cost follows into
    #                            pass 2; NOTES.md r5 session 2).
    #                            Requires lane_batch; auto-skipped in
    #                            raw/reduce/mask modes; composes with
    #                            shared-compaction staging.
    skip_stage: int = 0        # DEV ONLY: 1 = no per-window compaction,
    #                            2 = no merge either, 3 = kernel body off,
    #                            4 = + no output init (stage attribution)
    probe_mode: int = 0        # DEV ONLY kernel attribution ladder:
    #                            1 = window DMAs only, 2 = + field
    #                            extracts, 3 = + mask arithmetic
    net_cap: int = 0           # DEV ONLY: cap the staging compaction
    #                            network at this many stride steps
    #                            (lane_batch paths; results WRONG —
    #                            prices the network vs its reblock/
    #                            encode surroundings, probe_r8b)


@dataclass(frozen=True)
class ReduceSpec:
    """Static key for the fused neighbor-reduce (the device visitor).

    ``fn`` is a JAX-traceable elementwise callback evaluated INSIDE the
    pairs kernel on candidate planes; it receives a dict env with
    ``dx, dy, dz, d2, r2_i, orig_i, orig_j, set_i, set_j, p0_i, p1_i,
    p0_j, p1_j`` (+ ``r_j`` in variable mode) and returns ``n_out``
    arrays broadcastable against ``d2``; each is summed over the query's
    exact neighbor set (the same pairs ``run()`` emits).  ``fn`` is part
    of the jit cache key BY IDENTITY — define it once and reuse the same
    object, or every call recompiles.  TPU-native role of the reference
    visitor ``for_each_neighbor`` (TreeNSearch.h:221-258) fused into the
    search itself."""
    fn: object
    n_out: int
    has_payload: bool = False


@jax.jit
def _to_slot_major(tiles_arr):
    t, k8, ptile = tiles_arr.shape
    return jnp.transpose(tiles_arr, (0, 2, 1)).reshape(t * ptile, k8)


@jax.jit
def _gather_rows(flat_n, flat_f, fat_slot, qpos):
    nb = flat_n[qpos]
    fs = fat_slot[qpos // 128]
    nb_f = flat_f[jnp.maximum(fs, 0) * 128 + qpos % 128]
    return jnp.where((fs >= 0)[:, None], nb_f, nb)


def materialize_nbrs(pair: dict) -> jnp.ndarray:
    """Per-point padded neighbor rows for one pair's solution.

    The Pallas path keeps neighbor records in their narrow/fat tile
    layouts plus a per-point (tile, lane) pointer (``qpos``) — the TPU
    analog of the reference's ``solution_ptr`` indirection into
    per-thread record chunks (``TreeNSearch.cpp:2496-2500``) — so the
    (n, cap) per-point view is built only when a consumer asks for it.

    HOST-SIDE ONLY: operates on concrete arrays (it synchronizes the
    device); do not call it on traced values inside a jit.

    Memory discipline (the tile layout is ~5 GB at 10M points): the tile
    arrays are transposed to slot-major ONCE and — only after ``nbrs``
    has been stored on the dict — RELEASED from it, so the device never
    holds more than one full-size copy plus the result.  Callers keeping
    the raw step-fn solution keep ``counts``/``qpos`` and gain ``nbrs``;
    the tile-layout keys are consumed.
    """
    if "nbrs" in pair:
        return pair["nbrs"]
    flat_n = jax.block_until_ready(_to_slot_major(pair["nbrs_tiles"]))
    flat_f = _to_slot_major(pair["nbrs_fat"])
    fat_slot = pair["fat_slot"]
    qpos = pair["qpos"]
    n = qpos.shape[0]
    chunk = 1 << 21
    parts = [_gather_rows(flat_n, flat_f, fat_slot, qpos[a:a + chunk])
             for a in range(0, n, chunk)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    pair["nbrs"] = out
    # release the tile-layout storage only now (memory discipline at 10M)
    for k in ("nbrs_tiles", "nbrs_fat", "fat_slot"):
        pair.pop(k, None)
    return out


def attach_blocks(sol: dict) -> dict:
    """Re-link the shared candidate-set block arrays into each pair dict.

    The jitted search returns each tile-layout neighbor block, per-set
    qpos slice and the fat_slot map ONCE (top-level ``blocks`` /
    ``qpos_set`` / ``fat_slot``) because XLA allocates one output buffer
    per pytree occurrence — returning the same traced array in three
    pair dicts tripled the output footprint to 12.2 GB at 10M x 3 sets.
    Call this once on the HOST after the jit boundary; the pair dicts
    then hold the same concrete (shared) buffers and every consumer
    (``materialize_nbrs``, ``NeighborSolution``) works unchanged.
    ``api`` does this automatically; only direct ``make_step_fn``
    consumers that materialize neighbor rows need to call it.
    No-op for solutions without tile-layout blocks (reference path).
    """
    if "blocks" not in sol:
        return sol
    for name, pair in sol["pairs"].items():
        if "counts" not in pair or "nbrs" in pair or "nbrs_tiles" in pair:
            continue   # empty-set stub or already attached
        si, sj = name.split("-")
        pair["nbrs_tiles"] = sol["blocks"][f"b{sj}"]["nbrs_tiles"]
        pair["nbrs_fat"] = sol["blocks"][f"b{sj}"]["nbrs_fat"]
        pair["qpos"] = sol["qpos_set"][f"s{si}"]
        pair["fat_slot"] = sol["fat_slot"]
    return sol


def default_tiles_cap(n: int, brick: tuple = ()) -> int:
    """Static cap on 128-slot query tiles: every occupied grid row (or
    cell brick) is padded to a multiple of 128, so the tile count is
    ceil(n/128) plus one partial tile per occupied row/brick.  Bricks are
    sized for ~100 points, so their partial-tile slack is proportionally
    larger; the host regrows on ``tile_overflow`` either way."""
    base = -(-n // 128)
    if brick:
        return base + max(256, (base * 3) // 4)
    return base + max(256, base // 4)


def _lin_coords(ijk: jnp.ndarray, w: int, dy: jnp.ndarray, dz: jnp.ndarray):
    """Padded linear cell id; ijk are unpadded int32 coords (N, 3)."""
    return ((ijk[..., 0] + w) * dy + (ijk[..., 1] + w)) * dz + (ijk[..., 2] + w)


def _blocked_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D cumsum as a blocked 2-level scan: XLA's TPU lowering
    of both lax.associative_scan and flat jnp.cumsum takes minutes to
    compile at multi-million sizes (measured 2026-08-16)."""
    m = x.shape[0]
    blk = 1 << max(1, (m.bit_length() // 2))
    pad_len = (-m) % blk
    x2 = jnp.pad(x, (0, pad_len)).reshape(blk, -1)
    within = jnp.cumsum(x2, axis=1)
    row_off = jnp.concatenate([jnp.zeros((1,), x.dtype),
                               jnp.cumsum(within[:, -1])[:-1]])
    return (within + row_off[:, None]).reshape(-1)[:m]


def _cell_table(lin_s: jnp.ndarray, iota: jnp.ndarray, n: int,
                dense_cap: int, sort_build: bool) -> jnp.ndarray:
    """Dense cell table: table[q] = number of points with lin < q, i.e.
    the sorted start index of cell q with empty cells naturally pointing
    at the next occupied cell.  Two bit-identical builds
    (tests/test_prep_maps.py):

      sort_build=False: histogram scatter-add over the n sorted ids +
        blocked cumsum — right when n <= dense_cap.
      sort_build=True (n > dense_cap): the n-sized scatter dominates
        (~7 ns/index, ~7 ms at 1M with dense_cap = 262k) — compact the
        <= dense_cap cell-run BOUNDARIES by one cheap 2-operand sort
        (~1.3 ms at 1M), scatter each run's first sorted index with min
        into start_cell, and suffix-min fill: empty cells point at the
        next occupied run.  Role of the reference's counting pass
        (``TreeNSearch.cpp:417-424``) on its sorted cell runs.
    """
    if sort_build and n > 1:
        is_b = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                lin_s[1:] != lin_s[:-1]])
        key_b = jnp.where(is_b, lin_s, dense_cap + 1)
        kb_s, io_s = jax.lax.sort((key_b, iota), num_keys=1)
        k = min(dense_cap, n)
        start_cell = jnp.full((dense_cap + 1,), n, jnp.int32).at[
            kb_s[:k]].min(io_s[:k], mode="drop")
        return _blocked_rev_cummin(start_cell)
    hist = jnp.zeros((dense_cap + 1,), jnp.int32).at[lin_s + 1].add(1)
    return _blocked_cumsum(hist)


def _blocked_rev_cummin(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive REVERSE 1-D cummin (suffix minimum) as a blocked 2-level
    scan (same compile-time rationale as ``_blocked_cumsum``)."""
    m = x.shape[0]
    blk = 1 << max(1, (m.bit_length() // 2))
    pad_len = (-m) % blk
    big = jnp.iinfo(x.dtype).max
    x2 = jnp.pad(x, (0, pad_len), constant_values=big).reshape(blk, -1)
    within = jax.lax.cummin(x2, axis=1, reverse=True)
    row_first = within[:, 0]
    row_off = jnp.concatenate([
        jax.lax.cummin(row_first, axis=0, reverse=True)[1:],
        jnp.full((1,), big, x.dtype)])
    return jnp.minimum(within, row_off[:, None]).reshape(-1)[:m]


def _blocked_cummax(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D forward cummax as a blocked 2-level scan (same
    rationale as ``_blocked_cumsum``); values must be >= 0."""
    m = x.shape[0]
    blk = 1 << max(1, (m.bit_length() // 2))
    pad_len = (-m) % blk
    x2 = jnp.pad(x, (0, pad_len)).reshape(blk, -1)
    within = jax.lax.cummax(x2, axis=1)
    row_last = within[:, -1]
    row_off = jnp.concatenate([jnp.zeros((1,), x.dtype),
                               jax.lax.cummax(row_last)[:-1]])
    return jnp.maximum(within, row_off[:, None]).reshape(-1)[:m]


class FastCarry(NamedTuple):
    """Cell-assignment-derived state carried across steps (temporal
    coherence).

    The reference's whole design exploits coherence between simulation
    steps: almost-sorted points make the run-length cell extraction cheap
    (``TreeNSearch.cpp:417-424``) and octree node buffers persist across
    runs (``octree_internals.h:166-211``).  The TPU-native equivalent is
    this pytree: everything the search kernel needs that depends only on
    the points' CELL ASSIGNMENT (sort permutation, row-aligned layout,
    window descriptors, tier routing) is carried; each step re-derives the
    cell keys (cheap, elementwise) and rebuilds the carry only when some
    point changed cells (or the grid/radii changed).  Coordinates change
    every step, so the record arrays are always rebuilt — but the sort,
    dense-table scan, layout scans and descriptor gathers are skipped in
    the steady state.  Exact by construction: reuse happens only when a
    stable re-sort of the new keys would reproduce the carried permutation
    bit-for-bit (equal keys + stable sort => identical order).
    """
    valid: jnp.ndarray         # () bool
    lin_s: jnp.ndarray         # (n,) sorted linear cell ids
    lin_chk: jnp.ndarray       # (n,) cell ids BY ORIGINAL INDEX, stored
    #                            from the CHECK subgraph at rebuild time:
    #                            XLA does not guarantee bitwise-identical
    #                            recomputation across differently-fused
    #                            program regions, so comparing the check's
    #                            lin against prep's internal lin can flip
    #                            on boundary points (observed on TPU at
    #                            1M inside fori_loop: every step rebuilt);
    #                            comparing the same subgraph against its
    #                            own stored value is self-consistent
    r_chk: jnp.ndarray         # (n,) sorted radii at build ((0,) if fixed)
    idx_s: jnp.ndarray         # (n,) sorted slot -> original index
    inv_perm: jnp.ndarray      # (n,) original index -> sorted slot
    pp: jnp.ndarray            # (n,) sorted slot -> padded (row-aligned) slot
    qpos: jnp.ndarray          # (n,) original index -> padded slot (pp o inv)
    opad: jnp.ndarray          # (NPAD+slack,) padded slot -> ORIGINAL point
    #                            index (or n for padding): the sort
    #                            permutation composed with the layout map
    #                            at build time, so the per-step record
    #                            build is one direct row gather
    desc: jnp.ndarray          # (nt8, DESC_W) window descriptors
    fat_ids: jnp.ndarray       # (fat_cap,) fat-tier tile ids
    fat_slot: jnp.ndarray      # (tiles_cap,) tile -> fat slot (-1 narrow)
    dense_overflow: jnp.ndarray
    tile_overflow: jnp.ndarray
    rows_overflow: jnp.ndarray
    fat_overflow: jnp.ndarray
    win_max: jnp.ndarray
    n_cells_stat: jnp.ndarray
    win_hist: jnp.ndarray      # (64,) window-length histogram


def _pallas_statics(cfg: SearchConfig, knobs: FastKnobs) -> dict:
    """Static sizes shared by prep, search and the carry constructor."""
    from ..config import round_up
    from .pallas_pairs import TILE as PTILE
    w = cfg.stencil_w
    pack = knobs.pack
    brick = tuple(knobs.brick)
    tiles_cap = round_up(knobs.tiles_cap if knobs.tiles_cap > 0 else
                         default_tiles_cap(cfg.n_points, brick), knobs.tps)
    wcap_r = round_up(knobs.wcap, 8 * pack)
    fat_wcap_r = round_up(knobs.fat_wcap, 8 * pack)
    if brick:
        # brick windows: one per (u, v) cell-row offset of the brick's
        # (BI + 2w) x (BJ + 2w) row neighborhood; the brick's own rows
        # are the "center" windows (they hold the query's own cell run)
        BI, BJ, _ = brick
        offs_2d = [(u, v) for u in range(-w, BI + w)
                   for v in range(-w, BJ + w)]
        center_wins = tuple(i for i, (u, v) in enumerate(offs_2d)
                            if 0 <= u < BI and 0 <= v < BJ)
    else:
        offs_2d = [(di, dj) for di in range(-w, w + 1)
                   for dj in range(-w, w + 1)]
        center_wins = (len(offs_2d) // 2,)
    return {
        "w": w, "pack": pack, "brick": brick,
        "wcap": wcap_r,
        "fat_wcap": fat_wcap_r,
        "fat_cap": knobs.fat_cap,
        "tiles_cap": tiles_cap,
        "NPAD": tiles_cap * PTILE,
        # sentinel tail past NPAD: window DMAs overread up to a fat
        # window, the fat tier's dummy ids read one full query tile
        "slack": round_up(max(wcap_r, fat_wcap_r) + PTILE, 128),
        "nt8": -(-(tiles_cap + 1) // 8) * 8,  # +1 dummy: padded fat ids
        "rows_cap": knobs.rows_cap if knobs.rows_cap > 0 else
                    max(1 << 14, knobs.dense_cap >> 3),
        # brick candidates live in PLAIN sorted order (windows are exact
        # k-runs; only queries get a padded layout): static record rows
        # for that array, with the same overread slack
        "cand_slots": round_up(cfg.n_points, PTILE),
        # window-length histogram bin width: brick windows are a few
        # cells long, row-tile windows a whole tile's k-extent
        "hist_bin": 8 if brick else 32,
        "offs_2d": offs_2d,
        "center_wins": center_wins,
        "cand_sets": tuple(sorted({sj for (_, sj) in cfg.active_pairs})),
    }


def make_fast_carry0(cfg: SearchConfig, knobs: FastKnobs) -> FastCarry:
    """Fresh (invalid) carry with the shapes the jitted step expects."""
    from .pallas_pairs import DESC_W
    st = _pallas_statics(cfg, knobs)
    n = cfg.n_points

    def z(shape):
        return jnp.zeros(shape, jnp.int32)

    return FastCarry(
        valid=jnp.zeros((), jnp.bool_),
        lin_s=z((n,)), lin_chk=z((n,)),
        r_chk=jnp.zeros((n if cfg.variable else 0,), jnp.float32),
        idx_s=z((n,)),
        inv_perm=z((0 if st["brick"] else n,)),
        pp=z((n,)), qpos=z((n,)),
        opad=z((0,) if knobs.rec_expand and not st["brick"]
               else (st["NPAD"] + st["slack"],)),
        desc=z((st["nt8"], DESC_W)),
        fat_ids=z((st["fat_cap"],)), fat_slot=z((st["tiles_cap"],)),
        dense_overflow=z(()), tile_overflow=z(()), rows_overflow=z(()),
        fat_overflow=z(()), win_max=z(()), n_cells_stat=z(()),
        win_hist=z((64,)))


def _padded_lin(points, state, cfg, knobs, lin_base=None):
    """Linear padded cell id per point (+ grid strides).

    ``lin_base`` (optional device scalar) rebases the id to a contiguous
    local window of the global grid (the sharded path's slab + halos) —
    quantization itself always uses the GLOBAL grid origin so cell
    assignment is bit-identical to the single-device program."""
    w = cfg.stencil_w
    ky, kz = state.n_cells[1], state.n_cells[2]
    dy = ky + 2 * w
    dz = kz + 2 * w
    inv_cell = 1.0 / state.cell_size
    ijk = K.quantize(points, state.grid_min, inv_cell, state.n_cells)
    lin = _lin_coords(ijk, w, dy, dz)
    if lin_base is not None:
        lin = lin - lin_base
    lin = jnp.clip(lin, 0, knobs.dense_cap - 1)
    return lin, dy, dz, inv_cell


def _pallas_prep(points: jnp.ndarray, radii: Optional[jnp.ndarray],
                 state: GridState, cfg: SearchConfig,
                 knobs: FastKnobs,
                 valid: Optional[jnp.ndarray] = None,
                 owned_rng: Optional[tuple] = None,
                 lin_base=None, span_i=None) -> FastCarry:
    """Everything derived from the cell assignment: sort, dense table,
    row-aligned layout, window descriptors, tier routing (the roles of the
    reference's ``_points_to_cells_simd`` + octree build,
    ``TreeNSearch.cpp:837-1822``, re-designed as sort + scans).

    ``valid`` (optional, (n,) bool): rows flagged False (the sharded
    path's routing/halo padding) are parked in the last dense-table slot,
    outside every real window.  ``owned_rng`` (optional, (lo, hi) device
    scalars in unpadded i-cells): tiles of grid rows outside [lo, hi) are
    marked skip (descriptor FAT_COL = 2) — neither tier processes them
    and their windows do not count toward the fat routing — so a sharded
    device searches ONLY its owned slab's queries while halo records
    still serve as candidates.  ``lin_base`` rebases the linear ids to a
    slab-local dense-table window (see ``_padded_lin``); ``owned_rng`` is
    then given in rebased PADDED row-i units (``trow // dy``).
    ``span_i`` overrides the i-extent used by the dense-overflow check
    (the local window's, not the whole grid's)."""
    from .pallas_pairs import DESC_W, FAT_COL, LENS_OFF, TILE as PTILE

    st = _pallas_statics(cfg, knobs)
    if st["brick"]:
        assert valid is None and owned_rng is None and lin_base is None, \
            "brick layout does not serve the sharded path yet"
        return _pallas_prep_brick(points, radii, state, cfg, knobs, st)
    n = cfg.n_points
    w, pack = st["w"], st["pack"]
    wcap, fat_wcap, fat_cap = st["wcap"], st["fat_wcap"], st["fat_cap"]
    tiles_cap, NPAD, nt8 = st["tiles_cap"], st["NPAD"], st["nt8"]
    rows_cap = st["rows_cap"]
    offs_2d = st["offs_2d"]
    dense_cap = knobs.dense_cap

    kx, ky, kz = state.n_cells[0], state.n_cells[1], state.n_cells[2]
    dx = (kx + 2 * w) if span_i is None else span_i
    # overflow check in float to avoid int32 wrap on huge sparse domains
    lin, dy, dz, inv_cell = _padded_lin(points, state, cfg, knobs,
                                        lin_base=lin_base)
    if valid is not None:
        lin = jnp.where(valid, lin, dense_cap - 1)
    dense_size_f = (dx.astype(jnp.float32) * dy.astype(jnp.float32)
                    * dz.astype(jnp.float32))
    dense_overflow = (dense_size_f
                      > jnp.float32(dense_cap - 1)).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    r_s = radii[idx_s] if cfg.variable else jnp.zeros((0,), jnp.float32)

    table = _cell_table(lin_s, iota, n, dense_cap,
                        n > dense_cap and DEFAULT_TABLE_SORT)

    # ---- row-aligned padded layout (see ops/pallas_pairs.py) -----------
    # every occupied grid row ((i, j) fixed) is padded to a multiple
    # of PTILE slots, so each 128-slot tile lies in exactly one row.
    # Row-indexed arrays are sized by a (much smaller) static row cap:
    # real rows number dx*dy <= dense_cap/dz, so sizing them by
    # dense_cap wasted a ~dz factor of scan/gather work per step.
    n_rows = dx * dy
    rows_overflow = (n_rows + 1 > rows_cap).astype(jnp.int32)
    rid = jnp.minimum(lin_s // dz, rows_cap - 1)  # padded grid-row id
    r_idx = jnp.arange(rows_cap + 1, dtype=jnp.int32)
    r_eff = jnp.minimum(r_idx, dense_cap // dz + 1)  # avoid i32 wrap
    row_starts = table[jnp.minimum(r_eff * dz, dense_cap)]
    row_pads = (-(row_starts[1:] - row_starts[:-1])) % PTILE
    pads_inc = _blocked_cumsum(row_pads)
    pads_exc = pads_inc - row_pads
    npad_total = n + pads_inc[-1]
    tile_overflow = (npad_total > NPAD).astype(jnp.int32)
    # per-point padding offset pads_exc[rid] WITHOUT the 1M-element
    # gather (~7 ms at 1M, benchmarks/probe_r7a.out P2): scatter each
    # row's pad increment at the row's first sorted point and cumsum —
    # empty rows' increments stack on the same position (scatter-add).
    pad_step = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.minimum(row_starts[:-1], n)].add(
        jnp.concatenate([jnp.zeros((1,), jnp.int32), row_pads[:-1]]))
    pexc_pt = _blocked_cumsum(pad_step[:n]) if n > 0 else pad_step[:0]
    pp = jnp.minimum(iota + pexc_pt, NPAD - 1)  # padded slot

    # ---- per-tile row/k extents -----------------------------------------
    # a tile lies in ONE grid row and ``lin_s`` is sorted, so the tile's
    # row id and k-extent need only ARITHMETIC on the row tables plus two
    # one-element-per-tile gathers: tile t's grid row is the last padded
    # row starting at or before slot 128*t (binary search over the padded
    # row starts), its first/last real sorted slots follow from that
    # row's start/length, and lin_s at those two slots give the k-extent.
    # This replaces the r2 scheme's (NPAD,) gather + full-tile reduces
    # (~14 ms of the 1M prep, benchmarks/NOTES.md stage table).
    pstart = row_starts[:-1] + pads_exc          # padded row starts
    row_len = row_starts[1:] - row_starts[:-1]
    t0 = jnp.arange(tiles_cap, dtype=jnp.int32) * PTILE
    # tile -> grid row = max{r : pstart[r] <= 128*t}.  Padded row starts
    # are PTILE-aligned, so row r claims tile pstart[r]//PTILE by
    # scatter-max and a blocked forward cummax fills the gaps — no
    # binary search (log2(rows) dependent gathers per tile on TPU).
    tr0 = jnp.zeros((tiles_cap,), jnp.int32).at[pstart // PTILE].max(
        jnp.arange(rows_cap, dtype=jnp.int32), mode="drop")
    tr = _blocked_cummax(tr0)
    off_t = t0 - pstart[tr]
    cnt_t = jnp.clip(row_len[tr] - off_t, 0, PTILE)   # real slots in tile
    has = (cnt_t > 0).astype(jnp.int32)
    a_t = jnp.clip(row_starts[:-1][tr] + off_t, 0, jnp.maximum(n - 1, 0))
    b_t = jnp.clip(a_t + cnt_t - 1, 0, jnp.maximum(n - 1, 0))
    lmin = jnp.where(has > 0, lin_s[a_t], 0) if n > 0 else t0 * 0
    lmax = jnp.where(has > 0, lin_s[b_t], 0) if n > 0 else t0 * 0
    trow = jnp.where(has > 0, tr, 0)
    k0 = jnp.maximum(lmin - trow * dz, 0)
    k1 = jnp.maximum(lmax - trow * dz, 0)

    # ---- padded slot -> ORIGINAL point index (or n for padding) ---------
    # A row's real slots are contiguous from its padded start, so slot
    # p = 128 t + lane holds sorted index a_t[t] + lane when lane <
    # cnt_t[t] and padding otherwise — plain arithmetic + ONE gather.
    # (The r3 scheme scattered idx_s through pp: a 1.25M-slot scatter
    # that was the single largest prep term at 1M — 12.5 ms,
    # benchmarks/probe_r5d.out D5.)  The sentinel tail serves window DMA
    # overreads and the fat tier's padded dummy ids.
    lane_i = jnp.arange(PTILE, dtype=jnp.int32)[None, :]
    g_idx = jnp.minimum(a_t[:, None] + lane_i, jnp.maximum(n - 1, 0))
    lane_ok = lane_i < cnt_t[:, None]
    if knobs.rec_expand:
        # the expand kernel builds the padded layout by DMA copies; the
        # composed padded-slot -> original map (an 8.8 ms gather at 1M)
        # is not needed (the search derives orig fields from the padded
        # records themselves)
        opad = jnp.zeros((0,), jnp.int32)
    else:
        o_tiles = jnp.where(lane_ok, idx_s[g_idx] if n > 0 else n, n)
        opad = jnp.concatenate([o_tiles.reshape(-1),
                                jnp.full((st["slack"],), n, jnp.int32)])

    # ---- local stencil reach (variable mode) ----------------------------
    # the static stencil W = ceil(r_max_global/cell) bounds the
    # (di, dj) loop, but each tile only reaches as far as
    # max(its own max radius, the neighbor row's max radius) — the
    # role of the reference's per-cell max radii driving local ghost
    # width (TreeNSearch.cpp:781-835,1457-1466).  Windows beyond the
    # local reach get length 0 and are skipped inside the kernel.
    if cfg.variable:
        row_rmax = jnp.zeros((rows_cap,), jnp.float32).at[rid].max(r_s)
        tile_rmax = jnp.max(jnp.where(
            lane_ok, r_s[g_idx] if n > 0 else 0.0, 0.0), axis=1)

    # ---- window descriptors: one k-run per (di, dj) ---------------------
    # window = sorted range [table[row' + k0 - w], table[row' + k1+w+1])
    # of neighbor row row' = trow + di*dy + dj; windows of distinct
    # (di, dj) are disjoint, so the kernel needs no stencil recompute.
    # Start space must match the record build the consumer uses: the
    # pallas rec_expand mode reads windows from the SORTED records, the
    # gather build and the XLA fallback from the PADDED layout (the
    # sharded wrapper forces rec_expand=False, so owned_rng rides the
    # padded space).
    win_sorted = knobs.rec_expand and knobs.use_pallas and not st["brick"]
    starts_l, lens_l = [], []
    for (di, dj) in offs_2d:
        rp = jnp.clip(trow + di * dy + dj, 0, dense_cap // dz)
        base = jnp.minimum(rp * dz, dense_cap)
        if cfg.variable:
            reach = jnp.maximum(tile_rmax,
                                row_rmax[jnp.minimum(rp, rows_cap - 1)])
            # smallest integer reach in cells, rounded safely: take
            # floor(reach/cell) and step up unless that many whole
            # cells already cover the reach (directed-rounding-safe,
            # no epsilon slack; same role as the reference per-node
            # ghost width, TreeNSearch.cpp:1457-1466)
            w0 = jnp.floor(reach * inv_cell).astype(jnp.int32)
            w_need = jnp.clip(
                jnp.where(w0.astype(jnp.float32) * state.cell_size
                          >= reach, w0, w0 + 1),
                1, w)
            ok = (max(abs(di), abs(dj)) <= w_need).astype(jnp.int32)
            wk = w_need
        else:
            ok, wk = 1, w
        s = table[jnp.clip(base + k0 - wk, 0, dense_cap)]
        e = table[jnp.clip(base + k1 + wk + 1, 0, dense_cap)]
        lens_l.append(jnp.maximum(e - s, 0) * has * ok)
        if win_sorted:
            # rec_expand pallas engines DMA candidate windows straight
            # from the SORTED packed records: a window's k-run is
            # contiguous in sorted space too and the kernel's
            # ``off < ln`` bound masks every row beyond it, so no
            # padded-space rebase — and no rec_pad array at all — is
            # needed (the expand kernel then builds only the query
            # tiles; saves the padded-record write traffic and ~40 MB
            # at 1M / ~360 MB at 10M of HBM).
            starts_l.append(jnp.clip(s, 0, n))
        else:
            # window starts index the PADDED record layout (one array
            # serves queries and candidate windows): a window's k-run
            # lies in one grid row, so adding that row's pad offset
            # keeps the range contiguous and the length unchanged.
            # Rows' trailing pad slots carry sentinel records, so DMA
            # overreads self-mask.
            starts_l.append(jnp.clip(
                s + pads_exc[jnp.minimum(rp, rows_cap - 1)], 0, NPAD))
    starts = jnp.stack(starts_l, axis=1)
    lens = jnp.stack(lens_l, axis=1)
    if owned_rng is not None:
        # query-row filter (sharded): only tiles whose grid row lies in
        # the device's owned i-range (in rebased padded row-i units, see
        # docstring) run as queries
        i_pad = trow // dy
        is_q = ((i_pad >= owned_rng[0]) & (i_pad < owned_rng[1])
                & (has > 0))
        lens = lens * is_q[:, None].astype(jnp.int32)
    win_max = jnp.max(lens)
    # window-length histogram (bins of 32) for the host's wcap
    # auto-tune; counts nonzero windows only
    win_hist = jnp.zeros((64,), jnp.int32).at[
        jnp.clip(lens // 32, 0, 63)].add((lens > 0).astype(jnp.int32))

    # ---- fat tier routing -----------------------------------------------
    # packed DMAs start at the row floor of the first slot, so a
    # tier's effective capacity is its wcap minus (pack-1)
    fat_mask = jnp.max(lens, axis=1) > (wcap - (pack - 1))
    n_fat = jnp.sum(fat_mask.astype(jnp.int32))
    fat_overflow = (n_fat > fat_cap) | (win_max > fat_wcap - (pack - 1))
    rank = jnp.cumsum(fat_mask.astype(jnp.int32))
    tile_ids = jnp.arange(tiles_cap, dtype=jnp.int32)
    fat_ids = jnp.full((fat_cap,), tiles_cap, jnp.int32).at[
        jnp.where(fat_mask & (rank <= fat_cap), rank - 1, fat_cap)
    ].set(tile_ids, mode="drop")
    # tile -> fat slot (-1 = narrow), for select-at-gather merging
    fat_slot = jnp.where(fat_mask & (rank <= fat_cap), rank - 1, -1)

    n_win = len(offs_2d)
    fat_col = fat_mask.astype(jnp.int32)
    # padding tiles past the real layout (has = 0) skip BOTH tiers: they
    # otherwise burn a full tile of DMA + mask work on all-zero windows
    # (tiles_cap - occupied is ~15-30% of the grid)
    fat_col = jnp.where(has > 0, fat_col, 2)
    if owned_rng is not None:
        # 2 = skip in BOTH tiers (narrow runs only on 0; the fat tier's
        # id list excludes these because their lens were zeroed above)
        fat_col = jnp.where(is_q, fat_col, 2)
    from .pallas_pairs import A_COL, CNT_COL
    desc = jnp.zeros((nt8, DESC_W), jnp.int32)
    desc = desc.at[:tiles_cap, :n_win].set(starts)
    desc = desc.at[:tiles_cap, LENS_OFF:LENS_OFF + n_win].set(lens)
    # the record-expand kernel's per-tile source range (sorted start and
    # real count; ops/pallas_pairs.make_expand_call)
    desc = desc.at[:tiles_cap, A_COL].set(a_t)
    desc = desc.at[:tiles_cap, CNT_COL].set(cnt_t)
    desc = desc.at[:tiles_cap, FAT_COL].set(fat_col)

    # ---- carried maps ---------------------------------------------------
    # inv_perm[p] = sorted position of original point p, qpos[p] = its
    # padded slot.  Both are scatters of a permutation — computed instead
    # by ONE cheap key sort (idx_s is unique, so stability is moot): the
    # 1M lax.sort costs ~1.3 ms where the two 1M scatters cost ~12
    # (benchmarks/probe_r5d.out D6 vs D2).
    if n > 0:
        _, inv_perm, qpos_map = jax.lax.sort(
            (idx_s, iota, pp), num_keys=1, is_stable=False)
    else:
        inv_perm = qpos_map = jnp.zeros((0,), jnp.int32)
    if n > 1:
        n_cells_stat = 1 + jnp.sum(lin_s[1:] != lin_s[:-1])
    else:
        n_cells_stat = jnp.asarray(n, jnp.int32)

    return FastCarry(
        valid=jnp.ones((), jnp.bool_), lin_s=lin_s, lin_chk=lin,
        r_chk=r_s,
        idx_s=idx_s, inv_perm=inv_perm, pp=pp, qpos=qpos_map, opad=opad,
        desc=desc, fat_ids=fat_ids, fat_slot=fat_slot,
        dense_overflow=dense_overflow, tile_overflow=tile_overflow,
        rows_overflow=rows_overflow,
        fat_overflow=fat_overflow.astype(jnp.int32), win_max=win_max,
        n_cells_stat=n_cells_stat, win_hist=win_hist)


def _pallas_prep_brick(points: jnp.ndarray, radii: Optional[jnp.ndarray],
                       state: GridState, cfg: SearchConfig,
                       knobs: FastKnobs, st: dict) -> FastCarry:
    """Brick-tile layout prep (v6).

    Queries are grouped by compact BI x BJ x BK cell BRICKS instead of
    whole grid rows: a brick's <= ~128 points share a (BI+2w) x (BJ+2w)
    x (BK+2w)-cell joint neighborhood, so the kernel's per-query
    candidate volume drops ~2-3x vs row tiles (whose queries span a
    whole 128-slot k-extent).  The reference reaches the same locality
    through its ghost-cell octree leaves (``TreeNSearch.cpp:1197-1822``);
    here the leaf is a fixed cell brick and the "ghost" halo is the
    window k-extension, with exactness still carried purely by
    ``d^2 <= r^2`` over disjoint per-row windows.

    Two layouts coexist:
      - CANDIDATES stay in plain lin-sorted order (no padding): each
        window is an exact k-run ``[table[row*dz + klo],
        table[row*dz + khi + 1])`` of one grid row — query tiles no
        longer need to align with candidate slots, so the row padding
        of the row-tile scheme disappears entirely;
      - QUERIES get a brick-major padded layout (every occupied brick
        padded to a multiple of 128 slots), built by one extra stable
        key sort of the brick ids.

    ``opad``/``qpos``/``pp`` keep their carry roles with "padded slot"
    meaning the QUERY layout; ``inv_perm`` (a test-only map) is empty.
    """
    from .pallas_pairs import DESC_W, FAT_COL, LENS_OFF, TILE as PTILE

    n = cfg.n_points
    w, pack = st["w"], st["pack"]
    BI, BJ, BK = st["brick"]
    wcap, fat_wcap, fat_cap = st["wcap"], st["fat_wcap"], st["fat_cap"]
    tiles_cap, NPAD, nt8 = st["tiles_cap"], st["NPAD"], st["nt8"]
    bricks_cap = st["rows_cap"]
    offs_2d = st["offs_2d"]
    dense_cap = knobs.dense_cap

    kx, ky, kz = state.n_cells[0], state.n_cells[1], state.n_cells[2]
    dx, dy, dz = kx + 2 * w, ky + 2 * w, kz + 2 * w
    lin, _, _, inv_cell = _padded_lin(points, state, cfg, knobs)
    dense_size_f = (dx.astype(jnp.float32) * dy.astype(jnp.float32)
                    * dz.astype(jnp.float32))
    dense_overflow = (dense_size_f
                      > jnp.float32(dense_cap - 1)).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    r_s = radii[idx_s] if cfg.variable else jnp.zeros((0,), jnp.float32)

    hist = jnp.zeros((dense_cap + 1,), jnp.int32).at[lin_s + 1].add(1)
    table = _blocked_cumsum(hist)

    # ---- brick ids + brick-major query order -----------------------------
    nbx = -(-dx // BI)
    nby = -(-dy // BJ)
    nbz = -(-dz // BK)
    n_bricks = nbx * nby * nbz
    rows_overflow = (jnp.maximum(n_bricks, dx * dy) + 1
                     > bricks_cap).astype(jnp.int32)
    dydz = dy * dz
    i_s = lin_s // dydz
    rem = lin_s - i_s * dydz
    j_s = rem // dz
    k_s = rem - j_s * dz
    b_s = jnp.minimum((i_s // BI) * (nby * nbz) + (j_s // BJ) * nbz
                      + k_s // BK, bricks_cap - 1)
    # stable sort by brick id keeps lin order within each brick
    if n > 0:
        b_ss, oidx_q = jax.lax.sort((b_s, idx_s), num_keys=1,
                                    is_stable=True)
    else:
        b_ss, oidx_q = b_s, idx_s

    bhist = jnp.zeros((bricks_cap + 1,), jnp.int32).at[b_ss + 1].add(1)
    bstarts = _blocked_cumsum(bhist)
    blen = bstarts[1:] - bstarts[:-1]
    bpads = (-blen) % PTILE
    pads_inc = _blocked_cumsum(bpads)
    pads_exc = pads_inc - bpads
    npad_total = n + pads_inc[-1]
    tile_overflow = (npad_total > NPAD).astype(jnp.int32)

    # ---- tile -> brick (same scatter-max + cummax as the row scheme) -----
    pstart = bstarts[:-1] + pads_exc
    t0 = jnp.arange(tiles_cap, dtype=jnp.int32) * PTILE
    tb0 = jnp.zeros((tiles_cap,), jnp.int32).at[pstart // PTILE].max(
        jnp.arange(bricks_cap, dtype=jnp.int32), mode="drop")
    tb = _blocked_cummax(tb0)
    off_t = t0 - pstart[tb]
    cnt_t = jnp.clip(blen[tb] - off_t, 0, PTILE)
    has = (cnt_t > 0).astype(jnp.int32)
    a_t = jnp.clip(bstarts[:-1][tb] + off_t, 0, jnp.maximum(n - 1, 0))

    # ---- padded query slot -> ORIGINAL point (brick-major) --------------
    lane_i = jnp.arange(PTILE, dtype=jnp.int32)[None, :]
    g_idx = jnp.minimum(a_t[:, None] + lane_i, jnp.maximum(n - 1, 0))
    lane_ok = lane_i < cnt_t[:, None]
    o_tiles = jnp.where(lane_ok, oidx_q[g_idx] if n > 0 else n, n)
    opad = jnp.concatenate([o_tiles.reshape(-1),
                            jnp.full((st["slack"],), n, jnp.int32)])

    # ---- original -> padded query slot (one key sort, not a scatter) ----
    if n > 0:
        qslot = jnp.minimum(iota + pads_exc[b_ss], NPAD - 1)
        _, qpos_map = jax.lax.sort((oidx_q, qslot), num_keys=1,
                                   is_stable=False)
        pp = qslot
    else:
        qpos_map = pp = jnp.zeros((0,), jnp.int32)

    # ---- local stencil reach (variable mode) -----------------------------
    if cfg.variable:
        rid = jnp.minimum(lin_s // dz, bricks_cap - 1)
        row_rmax = jnp.zeros((bricks_cap,), jnp.float32).at[rid].max(r_s)
        r_tile = jnp.where(
            lane_ok,
            radii[jnp.minimum(o_tiles, jnp.maximum(n - 1, 0))]
            if n > 0 else 0.0, 0.0)
        tile_rmax = jnp.max(r_tile, axis=1)

    # ---- per-tile brick coords ------------------------------------------
    bx = tb // (nby * nbz)
    rem2 = tb - bx * (nby * nbz)
    by = rem2 // nbz
    bz = rem2 - by * nbz
    i0 = bx * BI
    j0 = by * BJ
    kb0 = bz * BK
    kb1 = kb0 + (BK - 1)

    # ---- window descriptors: one k-run per (u, v) brick-row offset ------
    starts_l, lens_l = [], []
    for (u, v) in offs_2d:
        ip = i0 + u
        jp = j0 + v
        in_dom = ((ip >= 0) & (ip < dx) & (jp >= 0) & (jp < dy))
        row = jnp.clip(ip * dy + jp, 0, jnp.maximum(dx * dy - 1, 0))
        base = jnp.minimum(row * dz, dense_cap)
        if cfg.variable:
            reach = jnp.maximum(tile_rmax,
                                row_rmax[jnp.minimum(row, bricks_cap - 1)])
            w0 = jnp.floor(reach * inv_cell).astype(jnp.int32)
            wk = jnp.clip(
                jnp.where(w0.astype(jnp.float32) * state.cell_size
                          >= reach, w0, w0 + 1),
                1, w)
            # cell distance from the brick's own row range to this row
            du = max(-u, u - (BI - 1), 0)
            dv = max(-v, v - (BJ - 1), 0)
            ok = (in_dom & (max(du, dv) <= wk)).astype(jnp.int32)
        else:
            ok, wk = in_dom.astype(jnp.int32), w
        # k-extension clipped at the row's own k range so a window can
        # never reach into an adjacent row's slots (brick k bounds are
        # static, unlike the occupancy-derived k0/k1 of the row scheme)
        klo = jnp.maximum(kb0 - wk, 0)
        khi = jnp.minimum(kb1 + wk, dz - 1)
        s = table[jnp.clip(base + klo, 0, dense_cap)]
        e = table[jnp.clip(base + khi + 1, 0, dense_cap)]
        lens_l.append(jnp.maximum(e - s, 0) * has * ok)
        # starts index PLAIN sorted order (no candidate padding)
        starts_l.append(jnp.clip(s, 0, st["cand_slots"]))
    starts = jnp.stack(starts_l, axis=1)
    lens = jnp.stack(lens_l, axis=1)
    win_max = jnp.max(lens)
    # histogram of per-TILE MAX window length: the fat routing spills a
    # tile when ANY of its (BI+2w)(BJ+2w) windows exceeds the cap, so the
    # wcap auto-tune must cover the p95 of the tile-max, not of single
    # windows (the window-p95 undersizes by the max-of-16 shift and sent
    # ~half the tiles to the fat tier: bench_r6_b223_p8.out, 163 ms)
    tile_wmax = jnp.max(lens, axis=1)
    win_hist = jnp.zeros((64,), jnp.int32).at[
        jnp.clip(tile_wmax // st["hist_bin"], 0, 63)].add(
        (tile_wmax > 0).astype(jnp.int32))

    # ---- fat tier routing (identical to the row scheme) ------------------
    fat_mask = jnp.max(lens, axis=1) > (wcap - (pack - 1))
    n_fat = jnp.sum(fat_mask.astype(jnp.int32))
    fat_overflow = (n_fat > fat_cap) | (win_max > fat_wcap - (pack - 1))
    rank = jnp.cumsum(fat_mask.astype(jnp.int32))
    tile_ids = jnp.arange(tiles_cap, dtype=jnp.int32)
    fat_ids = jnp.full((fat_cap,), tiles_cap, jnp.int32).at[
        jnp.where(fat_mask & (rank <= fat_cap), rank - 1, fat_cap)
    ].set(tile_ids, mode="drop")
    fat_slot = jnp.where(fat_mask & (rank <= fat_cap), rank - 1, -1)

    n_win = len(offs_2d)
    desc = jnp.zeros((nt8, DESC_W), jnp.int32)
    desc = desc.at[:tiles_cap, :n_win].set(starts)
    desc = desc.at[:tiles_cap, LENS_OFF:LENS_OFF + n_win].set(lens)
    fat_col = jnp.where(has > 0, fat_mask.astype(jnp.int32), 2)
    desc = desc.at[:tiles_cap, FAT_COL].set(fat_col)

    if n > 1:
        n_cells_stat = 1 + jnp.sum(lin_s[1:] != lin_s[:-1])
    else:
        n_cells_stat = jnp.asarray(n, jnp.int32)

    return FastCarry(
        valid=jnp.ones((), jnp.bool_), lin_s=lin_s, lin_chk=lin,
        r_chk=r_s,
        idx_s=idx_s, inv_perm=jnp.zeros((0,), jnp.int32), pp=pp,
        qpos=qpos_map, opad=opad,
        desc=desc, fat_ids=fat_ids, fat_slot=fat_slot,
        dense_overflow=dense_overflow, tile_overflow=tile_overflow,
        rows_overflow=rows_overflow,
        fat_overflow=fat_overflow.astype(jnp.int32), win_max=win_max,
        n_cells_stat=n_cells_stat, win_hist=win_hist)


def _build_records(rec8x: jnp.ndarray, opad: jnp.ndarray, lpp: int,
                   rec_wide: bool, cand_map: jnp.ndarray = None) -> tuple:
    """Padded record arrays from the (n+1, N_FIELDS) record columns and the
    carried padded-slot -> original-index map.

    Returns ``(q_t, rec_pad)``: queries with fields on sublanes and the
    packed candidate rows (``pack`` points per 128-lane row; sublane-dim
    row DMAs take exact unaligned starts, lane-dim needs 128 alignment —
    see ops/pallas_pairs.py).  Two equivalent schedules:

      - narrow (default): gather (NPAD, 8) rows, then lane-pad + reshape;
      - wide (``rec_wide``): lane-pad the (n+1, 8) columns BEFORE the
        gather so the gather moves (4*lpp)-byte rows and the separate
        lane-pad relayout pass disappears; queries are a lane slice of
        the same gathered array.

    Both produce bit-identical arrays (tests/test_pallas.py); which is
    faster is a hardware question (benchmarks/probe_r4c.py).

    ``cand_map`` (brick layout): candidates live in a DIFFERENT order
    than queries — queries gather through ``opad`` (brick-major padded),
    candidates through ``cand_map`` (plain sorted order + sentinel tail).
    """
    from .pallas_pairs import N_FIELDS
    if cand_map is not None:
        q_t = rec8x[opad].T                     # queries: brick-major
        recc = rec8x[cand_map]                  # candidates: sorted order
        recc = jax.lax.optimization_barrier(recc)
        rec_pad = jnp.pad(
            recc, ((0, 0), (0, lpp - N_FIELDS))).reshape(-1, 128) \
            if lpp > N_FIELDS else recc.reshape(-1, 128)
        return q_t, rec_pad
    if rec_wide and lpp > N_FIELDS:
        rec_w = jnp.pad(rec8x, ((0, 0), (0, lpp - N_FIELDS)))
        recp = rec_w[opad]                      # (NPAD+slack, lpp)
        recp = jax.lax.optimization_barrier(recp)
        q_t = recp[:, :N_FIELDS].T              # fields on sublanes
        rec_pad = recp.reshape(-1, 128)
    else:
        recp8 = rec8x[opad]                     # (NPAD+slack, 8)
        # barrier: without it XLA fuses the lane-pad + reshape + transpose
        # relayouts below INTO the row gather, and the whole record build
        # runs at gather-engine speed (~13 GB/s) instead of copy bandwidth
        recp8 = jax.lax.optimization_barrier(recp8)
        q_t = recp8.T                           # queries: fields on sublanes
        rec_pad = jnp.pad(
            recp8, ((0, 0), (0, lpp - N_FIELDS))).reshape(-1, 128)
    return q_t, rec_pad


def _pallas_search(points: jnp.ndarray, radii: Optional[jnp.ndarray],
                   search_radius: jnp.ndarray, state: GridState,
                   carry: FastCarry, cfg: SearchConfig,
                   knobs: FastKnobs,
                   set_ids_data: Optional[jnp.ndarray] = None,
                   orig_ids: Optional[jnp.ndarray] = None,
                   sentinel_orig: Optional[int] = None,
                   cand_sets: Optional[tuple] = None,
                   cand_offsets: Optional[tuple] = None,
                   multi_set: Optional[bool] = None,
                   raw: bool = False,
                   reduce_spec: Optional[ReduceSpec] = None,
                   payload: Optional[jnp.ndarray] = None,
                   reduce_active: Optional[tuple] = None,
                   mask_output: bool = False) -> dict:
    """Record build + fused pair kernel + per-pair gathers, all against a
    (possibly reused) ``FastCarry``.

    The sharded path overrides the set/orig identity sources (its local
    rows carry GLOBAL original indices and data-driven set ids) and takes
    ``raw=True``: the solution then exposes per-candidate-set ``blocks``
    (tile-layout counts/nbrs) instead of per-pair host-set gathers, and
    the caller routes them with the carry's maps."""
    from .pallas_pairs import (DESC_W, N_FIELDS, SENTINEL, TILE as PTILE,
                               make_pairs_call)
    from ..config import round_up

    st = _pallas_statics(cfg, knobs)
    n = cfg.n_points
    pack = st["pack"]
    wcap, fat_wcap, fat_cap = st["wcap"], st["fat_wcap"], st["fat_cap"]
    tiles_cap, NPAD = st["tiles_cap"], st["NPAD"]
    offs_2d = st["offs_2d"]
    if cand_sets is None:
        cand_sets = st["cand_sets"]
    if cand_offsets is None:
        cand_offsets = tuple(cfg.set_offsets[sj] for sj in cand_sets)
    if multi_set is None:
        multi_set = cfg.n_sets > 1
    n_win = len(offs_2d)
    reduce_mode = reduce_spec is not None
    assert not (reduce_mode and mask_output)
    if reduce_mode or mask_output:
        assert knobs.lane_batch, \
            "the fused reduce / mask contract needs lane_batch"
        assert knobs.skip_stage == 0 and knobs.probe_mode == 0
        if reduce_active is None:
            reduce_active = cfg.active_pairs
    caps = cfg.nbr_caps if cfg.nbr_caps is not None \
        else (cfg.nbr_cap,) * cfg.n_sets
    # per-block output row caps (8-row tiling); see pallas_pairs nbr_caps
    k8s = tuple(-(-caps[sj] // 8) * 8 for sj in cand_sets)
    idx_s = carry.idx_s
    iota = jnp.arange(n, dtype=jnp.int32)

    if set_ids_data is not None:
        set_id_o = set_ids_data
    elif cfg.n_sets > 1:
        set_id_o = jnp.asarray(np.repeat(
            np.arange(cfg.n_sets, dtype=np.int32), cfg.set_sizes))
    else:
        set_id_o = jnp.zeros((n,), jnp.int32)
    orig_o = orig_ids if orig_ids is not None else iota
    r2_fixed = (search_radius * search_radius).astype(jnp.float32)

    # ---- padded record arrays -------------------------------------------
    # Record arrays are INT32-typed: coordinates ride as f32 bit
    # patterns bitcast into ints and indices/set ids are plain ints.
    # The reverse (ints bitcast into f32 lanes) is UNSOUND on TPU:
    # indices < 2^23 are f32 denormals and the hardware flushes them
    # to zero in float relayouts (observed at 1M: every candidate
    # orig read 0, turning off self-exclusion).  Integer moves never
    # flush, and any f32 pattern is a valid int32.
    # Padding slots carry sentinel records: NaN coords make d^2 NaN so
    # the distance compare fails against every candidate and between
    # sentinels themselves (which lets the kernel restrict the index
    # self-exclusion to the center window).
    def _asbits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    rfield = radii if cfg.variable else jnp.zeros((n,), jnp.float32)
    # user per-point payload (fused reduce): rides the two spare record
    # fields, so the kernel sees it per candidate AND per query at zero
    # extra traffic (the record rows move anyway)
    if payload is not None:
        pl0_o = _asbits(payload[:, 0])
        pl1_o = _asbits(payload[:, 1])
    else:
        pl0_o = pl1_o = jnp.zeros((n,), jnp.int32)
    # records are built in ORIGINAL point order (no gathers: the columns
    # are the input arrays themselves), then moved to the padded layout
    # by ONE row gather through the composed original-index map below —
    # this replaces the r2 scheme's separate points[idx_s] /
    # set_ids[idx_s] 1M-row gathers with a single (NPAD,) index gather
    rec8 = jnp.stack([_asbits(points[:, 0]), _asbits(points[:, 1]),
                      _asbits(points[:, 2]), _asbits(rfield),
                      orig_o, set_id_o, pl0_o, pl1_o], axis=1)
    sent_xyz = jax.lax.bitcast_convert_type(jnp.float32(SENTINEL),
                                            jnp.int32)
    sent = jnp.zeros((N_FIELDS,), jnp.int32)
    sent = sent.at[0].set(sent_xyz).at[1].set(sent_xyz).at[2].set(
        sent_xyz)
    sent = sent.at[4].set(jnp.int32(sentinel_orig if sentinel_orig
                                    is not None else n))
    sent = sent.at[5].set(jnp.int32(-1))
    # ONE padded record array serves queries and candidate windows (the
    # window descriptors index the padded layout; see _pallas_prep).
    # Built by a row gather through the carried padded-slot map (a
    # direct (n, 8) row scatter runs on the scatter engine at ~10 GB/s
    # and costs ~45 ms/step at 1M, benchmarks/recbuild_probe.py).
    # Padding slots (opad = n) pick up the sentinel record: NaN coords
    # fail every distance compare (orig = n is kept as belt-and-braces).
    lpp = 128 // pack
    rec8x = jnp.concatenate([rec8, sent[None]])
    # padded slot -> original point index is carried pre-composed (opad),
    # so the record build is ONE row gather (brick mode: one per layout —
    # queries brick-major via opad, candidates plain sorted via idx_s)
    if st["brick"]:
        cand_map = jnp.concatenate([
            idx_s, jnp.full((st["cand_slots"] - n + st["slack"],), n,
                            jnp.int32)])
    else:
        cand_map = None
    if knobs.rec_expand and not st["brick"] and n > 0:
        # EXPAND-KERNEL record build (see make_expand_call): the fields
        # ride the SORT as payloads (stable sort on the same keys
        # reproduces the carried permutation bit-for-bit, so this works
        # identically on carry-reuse steps via the stored lin_chk), the
        # sorted packed records are interleaved once, and the padded
        # layout + query tiles are produced by contiguous DMA copies at
        # copy bandwidth instead of the (NPAD, 8) row gather + the opad
        # index gather (~22.6 ms/step at 1M, ~10x that at 10M).
        from .pallas_pairs import make_expand_call
        # set ids ride the sort whenever they are real: data-driven ids
        # (raw/sharded mode) or a multi-set engine — matching what the
        # gather build writes into rec8 col F_SET
        carry_sets = set_ids_data is not None or cfg.n_sets > 1
        ops_l = [carry.lin_chk, _asbits(points[:, 0]),
                 _asbits(points[:, 1]), _asbits(points[:, 2]), orig_o]
        if cfg.variable:
            ops_l.append(_asbits(rfield))
        if carry_sets:
            ops_l.append(set_id_o)
        if payload is not None:
            ops_l.append(pl0_o)
            ops_l.append(pl1_o)
        sorted_ = jax.lax.sort(tuple(ops_l), num_keys=1, is_stable=True)
        xs, ys, zs, os_ = sorted_[1], sorted_[2], sorted_[3], sorted_[4]
        k = 5
        if cfg.variable:
            rs_ = sorted_[k]
            k += 1
        else:
            rs_ = jnp.zeros((n,), jnp.int32)
        if carry_sets:
            ss_ = sorted_[k]
            k += 1
        else:
            ss_ = jnp.zeros((n,), jnp.int32)
        z0 = jnp.zeros((n,), jnp.int32)
        if payload is not None:
            p0s, p1s = sorted_[k], sorted_[k + 1]
        else:
            p0s = p1s = z0
        cols = jnp.stack([xs, ys, zs, rs_, os_, ss_, p0s, p1s], axis=1)
        if lpp > N_FIELDS:
            cols = jnp.pad(cols, ((0, 0), (0, lpp - N_FIELDS)))
        rpt = 128 // pack
        # slack: candidate windows DMA straight from these sorted rows
        # (the descriptors are in SORTED space under rec_expand — see
        # _pallas_prep win_sorted), so a window starting near n may
        # overread up to a fat-tier window of rows; all padding carries
        # the sentinel record
        n_rows_src = -(-n // pack) + max(rpt, fat_wcap // pack) + 4
        pad_pts = n_rows_src * pack - n
        sent_l = jnp.pad(sent, (0, lpp - N_FIELDS)) if lpp > N_FIELDS \
            else sent
        recs = jnp.concatenate(
            [cols, jnp.broadcast_to(sent_l[None], (pad_pts, lpp))]
        ).reshape(n_rows_src, 128)
        recsT = jnp.concatenate(
            [jnp.stack([xs, ys, zs, rs_, os_, ss_, p0s, p1s], axis=0),
             jnp.broadcast_to(sent[:, None], (N_FIELDS, 384))], axis=1)
        expand = make_expand_call(
            tiles_cap, tiles_cap, pack,
            sentinel_orig if sentinel_orig is not None else n,
            interpret=knobs.interpret, slack_tiles=st["slack"] // 128,
            build_rec=False)
        q_t = expand(carry.desc, recsT)
        # the pairs kernels consume the sorted rows directly; no padded
        # record array exists in this mode
        rec_pad = recs
        # mask contract: candidate slot s (= desc + in-window offset) is
        # the s-th SORTED point; padding decodes to the sentinel
        cand_orig = jnp.concatenate([
            os_, jnp.full((n_rows_src * pack - n,),
                          sentinel_orig if sentinel_orig is not None
                          else n, jnp.int32)]) if mask_output else None
    else:
        q_t, rec_pad = _build_records(rec8x, carry.opad, lpp,
                                      knobs.rec_wide, cand_map=cand_map)
        # mask contract: desc indexes the padded layout (brick mode: the
        # candidate plane) whose slot -> original map is carried
        cand_orig = (cand_map if st["brick"] else carry.opad) \
            if mask_output else None

    params = jnp.zeros((8, DESC_W), jnp.float32).at[0, 0].set(r2_fixed)

    # asymmetric per-window staging: the center windows (the query's own
    # cell rows) hold the most survivors; edges need less
    center_wins = st["center_wins"]
    if reduce_mode or mask_output:
        # no staging exists in reduce/mask mode; minimal widths satisfy
        # the kernel's shape contract and keep the (unused) scratch tiny
        pre_caps = (8,) * n_win
    else:
        pre_c = min(round_up(knobs.pre_cap, 8), max(k8s))
        pre_e = min(round_up(knobs.pre_edge, 8), pre_c)
        pre_caps = tuple(pre_c if i in center_wins else pre_e
                         for i in range(n_win))
    # shared-compaction gate: packed (set_id << orig_bits | orig) must fit
    # int32 for every set id that can appear in a window (all n_sets, not
    # just candidate sets) and every orig (incl. the sentinel n); raw mode
    # carries global indices whose bound the local cfg does not know
    orig_bits = int(n + 1).bit_length()
    shared = (knobs.shared_compact and knobs.lane_batch and multi_set
              and len(cand_sets) > 1 and not raw and not reduce_mode
              and not mask_output
              and ((cfg.n_sets - 1) << orig_bits) + n + 1 < 2 ** 31 - 1)
    kargs = dict(variable=cfg.variable, symmetric=cfg.symmetric,
                 cand_sets=cand_sets, cand_offsets=cand_offsets,
                 multi_set=multi_set, center_wins=center_wins,
                 shared_blocks=shared, orig_bits=orig_bits,
                 n_sets_total=cfg.n_sets,
                 interpret=knobs.interpret, pack=pack,
                 skip_stage=knobs.skip_stage,
                 # raw mode (sharded) carries GLOBAL ids whose bound the
                 # local cfg does not know -> disable packed-carry there
                 val_bound=(1 << 30) if raw else max(cfg.set_sizes),
                 mxu_prefix=knobs.mxu_prefix,
                 packed_carry=knobs.packed_carry,
                 phase_prefix=knobs.phase_prefix,
                 lane_batch=knobs.lane_batch,
                 probe_mode=knobs.probe_mode, net_cap=knobs.net_cap,
                 reduce_fn=reduce_spec.fn if reduce_mode else None,
                 reduce_n_out=reduce_spec.n_out if reduce_mode else 0,
                 reduce_active=(reduce_active
                                if (reduce_mode or mask_output) else ()),
                 mask_mode=mask_output)
    n_blocks_dbg = len(cand_sets)
    if knobs.skip_stage >= 5:
        # DEV: bypass the pallas calls entirely (XLA-side floor); >= 6
        # additionally elides the record build via DCE
        n_cnt = (len(cand_sets) + 2 + 7) // 8
        outs_n = [jnp.zeros((tiles_cap * 8, 128), jnp.int32)
                  for _ in range(n_cnt)] + \
                 [jnp.zeros((tiles_cap * k8b, 128), jnp.int32)
                  for k8b in k8s]
        outs_f = [jnp.zeros((fat_cap * 8, 128), jnp.int32)
                  for _ in range(n_cnt)] + \
                 [jnp.zeros((fat_cap * k8b, 128), jnp.int32)
                  for k8b in k8s]
        if knobs.skip_stage < 6:
            # keep the record arrays fully materialized (barrier stops
            # XLA from slicing the builds down to the consumed scalar)
            q_t_b, rec_b = jax.lax.optimization_barrier((q_t, rec_pad))
            outs_n = list(outs_n)
            outs_n[0] = outs_n[0] + (q_t_b[0, 0] + rec_b[0, 0])
    elif (knobs.split_stage and knobs.lane_batch
          and not raw and not reduce_mode and not mask_output
          and knobs.skip_stage == 0 and knobs.probe_mode == 0):
        # TWO-PASS kernel (see FastKnobs.split_stage): pass 1 is the
        # mask-mode kernel (geometry masks bit-packed in tile layout),
        # pass 2 unpacks the bits and runs staging + merge with the
        # identical output contract as the fused call — the epilogue
        # below is unchanged and the results are bit-identical
        # (tests/test_split_stage.py).  Composes with shared-compaction
        # multi-set staging (pass 2 keeps the combined network).
        mk = dict(kargs)
        mk.update(mask_mode=True, shared_blocks=False,
                  reduce_active=tuple(cfg.active_pairs))
        mask_n = make_pairs_call(wcap, (8,) * n_win, (), n_win,
                                 fat_tier=False, tiles_per_step=knobs.tps,
                                 **mk)
        bits_n = mask_n(tiles_cap, carry.desc, params, q_t, rec_pad)[1]
        mask_f = make_pairs_call(fat_wcap, (8,) * n_win, (), n_win,
                                 fat_tier=True, **mk)
        bits_f = mask_f(fat_cap, carry.desc, params, q_t, rec_pad,
                        ids=carry.fat_ids)[1]
        sk = dict(kargs)
        sk.update(stage_from_bits=True)
        narrow = make_pairs_call(wcap, pre_caps, k8s, n_win,
                                 fat_tier=False, tiles_per_step=knobs.tps,
                                 **sk)
        outs_n = narrow(tiles_cap, carry.desc, params, q_t, rec_pad,
                        bits=bits_n)
        fat = make_pairs_call(fat_wcap, pre_caps, k8s, n_win,
                              fat_tier=True, **sk)
        outs_f = fat(fat_cap, carry.desc, params, q_t, rec_pad,
                     ids=carry.fat_ids, bits=bits_f)
    else:
        narrow = make_pairs_call(wcap, pre_caps, k8s, n_win,
                                 fat_tier=False, tiles_per_step=knobs.tps,
                                 **kargs)
        outs_n = narrow(tiles_cap, carry.desc, params, q_t, rec_pad)
        fat = make_pairs_call(fat_wcap, pre_caps, k8s, n_win,
                              fat_tier=True, **kargs)
        outs_f = fat(fat_cap, carry.desc, params, q_t, rec_pad,
                     ids=carry.fat_ids)

    lane_grid = jnp.broadcast_to(jnp.arange(PTILE, dtype=jnp.int32),
                                 (fat_cap, PTILE))
    fat_rows = carry.fat_ids[:, None] * PTILE + lane_grid

    from .pallas_pairs import FAT_COL as _FC2
    if reduce_mode:
        # ---- fused-reduce epilogue: merge tiers, gather per point ------
        # the narrow tier zero-fills skipped (fat) tiles, so one small
        # (fat_cap x 128) scatter overwrites them with the fat tier's
        # accumulators — the exact analog of the counts merge below
        red_n, red_f = outs_n[0], outs_f[0]
        frows = fat_rows.reshape(-1)
        flats = []
        for k in range(reduce_spec.n_out):
            base = red_n[k::8].reshape(-1)
            fv = red_f[k::8].reshape(-1)
            flats.append(base.at[frows].set(fv, mode="drop"))
        stk = jax.lax.optimization_barrier(jnp.stack(flats, axis=0))
        if raw:
            # sharded mode: the caller gathers owned rows through its own
            # qpos slice and routes them home (parallel/sharded.py)
            return {
                "reduce_flat": stk,
                "cand_max": jnp.where(carry.fat_overflow > 0,
                                      carry.win_max, 0),
                "n_cells": carry.n_cells_stat,
                "error": state.error,
                "dense_overflow": carry.dense_overflow,
                "pallas_used": jnp.ones((), jnp.int32),
                "pre_surv_max": jnp.zeros((), jnp.int32),
                "pre_surv_edge_max": jnp.zeros((), jnp.int32),
                "tile_overflow": carry.tile_overflow,
                "rows_overflow": carry.rows_overflow,
                "tiles_used": jnp.sum(
                    (carry.desc[:tiles_cap, _FC2] != 2).astype(jnp.int32)),
            }
        gathered = jax.lax.optimization_barrier(stk[:, carry.qpos])
        red = {}
        for si in range(cfg.n_sets):
            red[f"s{si}"] = jax.lax.dynamic_slice_in_dim(
                gathered, cfg.set_offsets[si], max(cfg.set_sizes[si], 1),
                axis=1)[:, :cfg.set_sizes[si]]
        tiles_used_r = jnp.sum(
            (carry.desc[:tiles_cap, _FC2] != 2).astype(jnp.int32))
        return {
            "reduce": red,
            "pairs": {},
            "cand_max": jnp.where(carry.fat_overflow > 0,
                                  carry.win_max, 0),
            "n_cells": carry.n_cells_stat,
            "error": state.error,
            "dense_overflow": carry.dense_overflow,
            "straddle": jnp.zeros((), jnp.int32),
            "pallas_used": jnp.ones((), jnp.int32),
            # no staging exists in reduce mode -> no pre-cap regrow
            "pre_surv_max": jnp.zeros((), jnp.int32),
            "pre_surv_edge_max": jnp.zeros((), jnp.int32),
            "tile_overflow": carry.tile_overflow,
            "rows_overflow": carry.rows_overflow,
            "tiles_used": tiles_used_r,
            "win_hist": carry.win_hist,
            "win_max": carry.win_max,
        }

    if mask_output:
        # ---- MASK-CONTRACT epilogue (see api.run_mask) ----------------
        # No compaction/merge ran; the kernel outputs are the per-query
        # counts and the tile-layout bit-packed pair masks.  Everything a
        # consumer needs to enumerate pairs rides along: window
        # descriptors, the candidate slot -> original-id map, the query
        # tiles' original ids/sets, and the point -> padded-slot map.
        rows_all = n_win * (wcap // pack)
        rows_all_f = n_win * (fat_wcap // pack)
        cnt_n, cnt_f = outs_n[0], outs_f[0]
        counts_flat = cnt_n[0::8].reshape(-1).at[
            fat_rows.reshape(-1)].set(cnt_f[0::8].reshape(-1),
                                      mode="drop")
        counts_flat = jax.lax.optimization_barrier(counts_flat)
        gathered = counts_flat[carry.qpos]
        counts = {}
        for si in range(cfg.n_sets):
            counts[f"s{si}"] = jax.lax.dynamic_slice_in_dim(
                gathered, cfg.set_offsets[si], max(cfg.set_sizes[si], 1)
            )[:cfg.set_sizes[si]]
        nq = tiles_cap * PTILE
        return {
            "mask": {
                "bits_tiles": outs_n[1].reshape(tiles_cap, rows_all,
                                                PTILE),
                "bits_fat": outs_f[1].reshape(fat_cap, rows_all_f, PTILE),
                "counts": counts,
                "counts_flat": counts_flat,
                "desc": carry.desc,
                "fat_slot": carry.fat_slot,
                "fat_ids": carry.fat_ids,
                "qpos": carry.qpos,
                # F_ORIG / F_SET record rows of the query tiles
                "q_orig": jax.lax.slice(q_t, (4, 0), (5, nq))[0],
                "q_set": jax.lax.slice(q_t, (5, 0), (6, nq))[0],
                "cand_orig": cand_orig,
            },
            "pairs": {},
            "cand_max": jnp.where(carry.fat_overflow > 0,
                                  carry.win_max, 0),
            "n_cells": carry.n_cells_stat,
            "error": state.error,
            "dense_overflow": carry.dense_overflow,
            "straddle": jnp.zeros((), jnp.int32),
            "pallas_used": jnp.ones((), jnp.int32),
            # the mask contract cannot truncate -> no pre-cap regrow
            "pre_surv_max": jnp.zeros((), jnp.int32),
            "pre_surv_edge_max": jnp.zeros((), jnp.int32),
            "tile_overflow": carry.tile_overflow,
            "rows_overflow": carry.rows_overflow,
            "tiles_used": jnp.sum(
                (carry.desc[:tiles_cap, _FC2] != 2).astype(jnp.int32)),
            "win_hist": carry.win_hist,
            "win_max": carry.win_max,
        }

    pairs = {}
    # one kernel output block per DISTINCT candidate set; pairs that
    # share set_j share the block arrays (the neighbor set of a query
    # against set_j does not depend on the query's own set)
    blk = {}
    n_cnt = (len(cand_sets) + 2 + 7) // 8
    for b, sj in enumerate(cand_sets):
        cnt_n, nbr_n = outs_n[b // 8], outs_n[n_cnt + b]
        cnt_f, nbr_f = outs_f[b // 8], outs_f[n_cnt + b]
        cr = b % 8              # this block's count row in the group
        # merge the fat tier's counts INTO the narrow counts by one small
        # scatter (fat_cap x 128), so the per-pair epilogue is a single
        # gather through the carried qpos map (padded fat ids point past
        # the array -> dropped)
        counts_flat = cnt_n[cr::8].reshape(-1).at[fat_rows.reshape(-1)].set(
            cnt_f[cr::8].reshape(-1), mode="drop")
        # barrier: keep the strided slice + scatter + 1M gather chain from
        # fusing into downstream reductions (XLA's fused dependent-gather
        # reduce runs element-at-a-time on TPU)
        counts_flat = jax.lax.optimization_barrier(counts_flat)
        blk[sj] = {
            "counts_flat": counts_flat,
            "counts_all": cnt_n[cr::8], "counts_fat": cnt_f[cr::8],
            "nbrs_tiles": nbr_n.reshape(tiles_cap, k8s[b], PTILE),
            "nbrs_fat": nbr_f.reshape(fat_cap, k8s[b], PTILE)}
    # shared pre-cap regrow signals: rows n_blocks / n_blocks+1 of the
    # counts group hold the max over ALL blocks already
    sc, se = len(cand_sets), len(cand_sets) + 1
    pre_surv_c = jnp.maximum(jnp.max(outs_n[sc // 8][(sc % 8)::8]),
                             jnp.max(outs_f[sc // 8][(sc % 8)::8]))
    pre_surv_e = jnp.maximum(jnp.max(outs_n[se // 8][(se % 8)::8]),
                             jnp.max(outs_f[se // 8][(se % 8)::8]))
    # occupied tile count (dead tiles carry FAT_COL = 2 and are always a
    # suffix of the layout): drives the host's one-shot tiles_cap snug
    from .pallas_pairs import FAT_COL as _FC
    tiles_used = jnp.sum(
        (carry.desc[:tiles_cap, _FC] != 2).astype(jnp.int32))
    if raw:
        return {
            "blocks": blk,
            "cand_max": jnp.where(carry.fat_overflow > 0,
                                  carry.win_max, 0),
            "n_cells": carry.n_cells_stat,
            "error": state.error,
            "dense_overflow": carry.dense_overflow,
            "pallas_used": jnp.ones((), jnp.int32),
            "pre_surv_max": pre_surv_c,
            "pre_surv_edge_max": pre_surv_e,
            "tile_overflow": carry.tile_overflow,
            "rows_overflow": carry.rows_overflow,
            "tiles_used": tiles_used,
        }
    # per-SET query-position slices, computed once: pairs sharing set_i
    # share the slice (same device buffer at the jit boundary)
    qpos_set = {}
    # counts for ALL blocks through ONE stacked gather: gather cost on
    # TPU is ~per-index (benchmarks/probe_r7a.out: ~7 ns/element at 1M),
    # so 9 per-pair gathers over 3 sets x 3 blocks at 10M paid 3x the
    # indices of one (n_blocks, NP) gather that moves n_blocks values
    # per index.  Single-block configs collapse to the old shape.
    if len(cand_sets) > 1:
        counts_stack = jnp.stack(
            [blk[sj]["counts_flat"] for sj in cand_sets], axis=0)
        gathered_all = jax.lax.optimization_barrier(
            counts_stack[:, carry.qpos])
    else:
        gathered_all = None
    for (si, sj) in cfg.active_pairs:
        name = _pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        if n_i > 0:
            # ONE gather through the carried original->padded-slot map
            # (counts already tier-merged above; the NEIGHBOR blocks stay
            # separate — scattering fat nbr rows over the narrow output
            # would copy the whole multi-GB narrow array, measured OOM
            # at 10M — and merge by select inside materialize_nbrs)
            if f"s{si}" not in qpos_set:
                qpos_set[f"s{si}"] = jax.lax.dynamic_slice_in_dim(
                    carry.qpos, cfg.set_offsets[si], n_i)
            if gathered_all is not None:
                counts = jax.lax.dynamic_slice_in_dim(
                    gathered_all[cand_sets.index(sj)],
                    cfg.set_offsets[si], n_i)
            else:
                counts = jax.lax.optimization_barrier(
                    blk[sj]["counts_flat"][qpos_set[f"s{si}"]])
            max_count = jnp.max(counts)
            # neighbor rows stay in tile layout + per-point pointer (see
            # materialize_nbrs), and the BLOCK arrays are returned ONCE
            # in the top-level "blocks"/"qpos_set"/"fat_slot" entries —
            # repeating the same traced array in several pair dicts
            # makes XLA allocate an output buffer PER OCCURRENCE (no
            # tuple-output aliasing): measured 12.2 GB of outputs for
            # 4.3 GB of data at 10M x 3 sets (benchmarks/memprobe_10m).
            # attach_blocks() re-links them host-side after the jit.
            pairs[name] = {"counts": counts, "max_count": max_count}
        else:
            pairs[name] = {
                "counts": jnp.zeros((0,), jnp.int32),
                "nbrs": jnp.zeros((0, caps[sj]), jnp.int32),
                "max_count": jnp.zeros((), jnp.int32)}

    return {
        "pairs": pairs,
        "blocks": {f"b{sj}": {"nbrs_tiles": blk[sj]["nbrs_tiles"],
                              "nbrs_fat": blk[sj]["nbrs_fat"]}
                   for sj in blk},
        "qpos_set": qpos_set,
        "fat_slot": carry.fat_slot,
        "cand_max": jnp.where(carry.fat_overflow > 0, carry.win_max, 0),
        "n_cells": carry.n_cells_stat,
        "error": state.error,
        "dense_overflow": carry.dense_overflow,
        "straddle": jnp.zeros((), jnp.int32),
        "pallas_used": jnp.ones((), jnp.int32),
        # max survivors in any center/edge window (shared counts rows):
        # beyond the pre-cap means pre-compaction truncated -> regrow
        "pre_surv_max": pre_surv_c,
        "pre_surv_edge_max": pre_surv_e,
        "tile_overflow": carry.tile_overflow,
        "rows_overflow": carry.rows_overflow,
        "tiles_used": tiles_used,
        "win_hist": carry.win_hist,
        "win_max": carry.win_max,
    }


def _pallas_applicable(cfg: SearchConfig, knobs: FastKnobs) -> bool:
    """Static gate for the fused kernel: <= 8 distinct candidate sets, a
    record array within the memory budget (512/pack bytes per point) and
    a stencil the descriptor layout supports."""
    cand_sets = {sj for (_, sj) in cfg.active_pairs}
    if knobs.brick:
        BI, BJ, _ = knobs.brick
        w = cfg.stencil_w
        # descriptor row budget: starts in cols [0, n_win), lens in
        # [LENS_OFF, LENS_OFF + n_win), FAT_COL at 127 -> n_win <= 49
        if (BI + 2 * w) * (BJ + 2 * w) > 49:
            return False
    return (knobs.use_pallas and 1 <= len(cand_sets) <= 8
            and cfg.n_points <= (1 << 22) * knobs.pack
            and cfg.stencil_w <= 3)


def build_and_search_fast_carry(points: jnp.ndarray,
                                radii: Optional[jnp.ndarray],
                                search_radius: jnp.ndarray,
                                cell_size: jnp.ndarray,
                                state: GridState,
                                carry: FastCarry,
                                cfg: SearchConfig,
                                knobs: FastKnobs,
                                reduce_spec: Optional[ReduceSpec] = None,
                                payload: Optional[jnp.ndarray] = None,
                                mask_output: bool = False,
                                ) -> tuple[dict, GridState, FastCarry]:
    """Temporal-coherence step: reuse the carried cell structure when no
    point changed cells (the reference's core coherence trick,
    ``TreeNSearch.cpp:417-424``), else rebuild it.

    Exactness: the carry is reused only when (a) the grid box/cell size
    are unchanged (hysteresis kept the previous grid), (b) every point's
    padded linear cell id equals its value at build time, and (c) in
    variable mode every radius is unchanged.  Under (a)+(b) a stable
    re-sort would reproduce the carried permutation exactly, so every
    derived structure (table, layout, descriptors) is bit-identical to a
    rebuild.  Requires ``_pallas_applicable(cfg, knobs)``.
    """
    assert _pallas_applicable(cfg, knobs) and cfg.n_points > 0
    prev = state
    state = update_grid(state, points, cell_size)
    same_grid = (prev.valid
                 & jnp.all(state.grid_min == prev.grid_min)
                 & jnp.all(state.n_cells == prev.n_cells)
                 & (state.cell_size == prev.cell_size))
    lin, _, _, _ = _padded_lin(points, state, cfg, knobs)
    # compare this subgraph's keys against the value THIS subgraph stored
    # at the last rebuild (see FastCarry.lin_chk)
    same = carry.valid & same_grid & jnp.all(lin == carry.lin_chk)
    if cfg.variable:
        same = same & jnp.all(radii[carry.idx_s] == carry.r_chk)
    carry = jax.lax.cond(
        same,
        lambda: carry._replace(valid=jnp.ones((), jnp.bool_)),
        lambda: _pallas_prep(points, radii, state, cfg,
                             knobs)._replace(lin_chk=lin))
    sol = _pallas_search(points, radii, search_radius, state, carry,
                         cfg, knobs, reduce_spec=reduce_spec,
                         payload=payload, mask_output=mask_output)
    sol["rebuilt"] = jnp.logical_not(same).astype(jnp.int32)
    return sol, state, carry


@partial(jax.jit, static_argnames=("cfg", "knobs"))
def build_and_search_fast_carry_jit(points, radii, search_radius, cell_size,
                                    state, carry, cfg: SearchConfig,
                                    knobs: FastKnobs):
    return build_and_search_fast_carry(points, radii, search_radius,
                                       cell_size, state, carry, cfg, knobs)


@partial(jax.jit, static_argnames=("cfg", "knobs", "reduce_spec"))
def build_and_search_fast_carry_reduce_jit(points, radii, payload,
                                           search_radius, cell_size,
                                           state, carry, cfg: SearchConfig,
                                           knobs: FastKnobs,
                                           reduce_spec: ReduceSpec):
    """Fused neighbor-reduce step (see ReduceSpec / api.run_reduce)."""
    return build_and_search_fast_carry(points, radii, search_radius,
                                       cell_size, state, carry, cfg, knobs,
                                       reduce_spec=reduce_spec,
                                       payload=payload)


@partial(jax.jit, static_argnames=("cfg", "knobs"))
def build_and_search_fast_carry_mask_jit(points, radii, search_radius,
                                         cell_size, state, carry,
                                         cfg: SearchConfig,
                                         knobs: FastKnobs):
    """Tile-layout bitmask contract step (see api.run_mask)."""
    return build_and_search_fast_carry(points, radii, search_radius,
                                       cell_size, state, carry, cfg, knobs,
                                       mask_output=True)


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
        sol["straddle"] = jnp.zeros((), jnp.int32)
        sol["pallas_used"] = jnp.zeros((), jnp.int32)
        sol["tile_overflow"] = jnp.zeros((), jnp.int32)
        return sol, state

    if _pallas_applicable(cfg, knobs):
        carry = _pallas_prep(points, radii, state, cfg, knobs)
        sol = _pallas_search(points, radii, search_radius, state, carry,
                             cfg, knobs)
        return sol, state

    # ------------------------- XLA tile path -----------------------------
    # Fallback for sparse domains / > 8 candidate sets / CPU, using the
    # SAME v3 geometry as the Pallas engine: ``_pallas_prep``'s row-aligned
    # layout and single-k-run window descriptors, consumed by plain XLA
    # dynamic slices + ``compact_rows``.  One window per (di, dj), windows
    # provably disjoint — the r1 two-subwindow scheme and its ``straddle``
    # host fallback are gone (VERDICT r3 item 7); windows wider than wcap
    # surface through ``cand_max`` and the host regrows wcap.
    # no record packing outside Mosaic; row layout (the XLA loop keeps
    # the v3 single-row tile geometry)
    knobs1 = knobs._replace(pack=1, brick=(), rec_expand=False)
    carry = _pallas_prep(points, radii, state, cfg, knobs1)
    sol = _xla_tile_search(points, radii, search_radius, state, carry,
                           cfg, knobs1)
    return sol, state


def _xla_tile_search(points: jnp.ndarray, radii: Optional[jnp.ndarray],
                     search_radius: jnp.ndarray, state: GridState,
                     carry: FastCarry, cfg: SearchConfig,
                     knobs: FastKnobs) -> dict:
    """Row-aligned tile search in plain XLA against a ``FastCarry``.

    Role of the reference's scalar pipeline (``TreeNSearch.cpp:
    1873-2160``) re-expressed on the fast path's structures: queries are
    128-slot row-aligned tiles, candidates come from the carried window
    descriptors (one contiguous sorted k-run per stencil (di, dj)), masks
    are the exact f32 ``d^2 <= r^2`` with index self-exclusion (windows
    are disjoint, so one global index compare is exact), and rows are
    front-packed by ``compact_rows`` — the XLA analog of the Pallas
    kernel's in-VMEM compaction.
    """
    from .pallas_pairs import LENS_OFF, SENTINEL, TILE as PTILE

    st = _pallas_statics(cfg, knobs)
    n = cfg.n_points
    wcap = st["wcap"]
    tiles_cap, NPAD = st["tiles_cap"], st["NPAD"]
    n_win = len(st["offs_2d"])
    group = knobs.group
    k_sel = cfg.nbr_cap
    iota = jnp.arange(n, dtype=jnp.int32)

    # padded-slot field arrays through the carried layout map; the
    # sentinel row (opad == n) carries NaN coords (fails every distance
    # compare) and orig = n (never equals a real query index)
    nan1 = jnp.full((1,), SENTINEL, jnp.float32)
    set_ids = jnp.asarray(np.repeat(
        np.arange(cfg.n_sets, dtype=np.int32), cfg.set_sizes))
    opad = carry.opad
    xp = jnp.concatenate([points[:, 0], nan1])[opad]
    yp = jnp.concatenate([points[:, 1], nan1])[opad]
    zp = jnp.concatenate([points[:, 2], nan1])[opad]
    op = jnp.concatenate([iota, jnp.full((1,), n, jnp.int32)])[opad]
    sp = jnp.concatenate([set_ids, jnp.full((1,), -1, jnp.int32)])[opad]
    rp = jnp.concatenate([radii, nan1])[opad] if cfg.variable else None

    offsets_arr = np.asarray(cfg.set_offsets, np.int32)
    r2_fixed = (search_radius * search_radius).astype(jnp.float32)
    slot_in_win = jnp.arange(wcap, dtype=jnp.int32)[None, :]
    desc = carry.desc
    n_groups = -(-tiles_cap // group)
    # group-pad the tile range; padded tiles read descriptor row 0 and
    # produce rows that the per-set qpos gather never touches
    m_width = n_win * wcap

    def tile_body(t):
        t = jnp.minimum(t, tiles_cap - 1)
        base = t * PTILE

        def qload(field):
            return jax.lax.dynamic_slice(field, (base,), (PTILE,))

        my_orig = qload(op)
        my_set = qload(sp)
        qx = qload(xp)[:, None]
        qy = qload(yp)[:, None]
        qz = qload(zp)[:, None]
        my_r2 = (qload(rp) ** 2)[:, None] if cfg.variable else None

        masks, locs, wsets = [], [], []
        for w in range(n_win):
            s = desc[t, w]
            ln = desc[t, LENS_OFF + w]

            def load(field, s=s):
                return jax.lax.dynamic_slice(field, (s,), (wcap,))[None, :]

            wx = load(xp)
            wy = load(yp)
            wz = load(zp)
            wo = load(op)
            ddx = wx - qx
            ddy = wy - qy
            ddz = wz - qz
            d2 = (ddx * ddx + ddy * ddy) + ddz * ddz  # f32, oracle order
            if cfg.variable:
                crit = d2 <= my_r2
                if cfg.symmetric:
                    wr = load(rp)
                    crit = crit | (d2 <= wr * wr)
            else:
                crit = d2 <= r2_fixed
            # windows of distinct (di, dj) are DISJOINT sorted ranges and
            # each point occupies one padded slot, so a single global
            # index compare is exactly the self-exclusion rule
            m = (crit & (slot_in_win < ln) & (wo != my_orig[:, None]))
            masks.append(m)
            if cfg.n_sets == 1:
                locs.append(wo * jnp.ones((PTILE, 1), jnp.int32))
            else:
                ws = load(sp)
                off_j = jnp.zeros_like(wo)
                for sj in range(cfg.n_sets):
                    off_j = jnp.where(ws == sj, offsets_arr[sj], off_j)
                locs.append((wo - off_j) * jnp.ones((PTILE, 1), jnp.int32))
                wsets.append(ws * jnp.ones((PTILE, 1), jnp.int32))

        mask_all = jnp.concatenate(masks, axis=1)
        locj_all = jnp.concatenate(locs, axis=1)
        if cfg.n_sets > 1:
            wset_all = jnp.concatenate(wsets, axis=1)

        out = {}
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

    pairs = {}
    for (si, sj) in cfg.active_pairs:
        name = _pair_name(si, sj)
        n_i = cfg.set_sizes[si]
        cnt_all = mapped[name]["counts"].reshape(-1)
        nbr_all = mapped[name]["nbrs"].reshape(-1, k_sel)
        if n_i > 0:
            rows = jax.lax.dynamic_slice_in_dim(
                carry.qpos, cfg.set_offsets[si], n_i)
            counts = cnt_all[rows]
            nbrs = nbr_all[rows]
            max_count = jnp.max(counts)
        else:
            counts = jnp.zeros((0,), jnp.int32)
            nbrs = jnp.zeros((0, k_sel), jnp.int32)
            max_count = jnp.zeros((), jnp.int32)
        pairs[name] = {"counts": counts, "nbrs": nbrs,
                       "max_count": max_count}

    return {
        "pairs": pairs,
        # windows wider than wcap get truncated candidates; win_max is the
        # true maximum, so the host regrow sees it and grows wcap
        "cand_max": jnp.where(carry.win_max > wcap, carry.win_max, 0),
        "n_cells": carry.n_cells_stat,
        "error": state.error,
        "dense_overflow": carry.dense_overflow,
        "straddle": jnp.zeros((), jnp.int32),
        "pallas_used": jnp.zeros((), jnp.int32),
        "tile_overflow": carry.tile_overflow,
        "rows_overflow": carry.rows_overflow,
        "win_hist": carry.win_hist,
        "win_max": carry.win_max,
    }


@partial(jax.jit, static_argnames=("cfg", "knobs"))
def build_and_search_fast_jit(points, radii, search_radius, cell_size, state,
                              cfg: SearchConfig, knobs: FastKnobs):
    return build_and_search_fast(points, radii, search_radius, cell_size,
                                 state, cfg, knobs)


def decode_mask(mask: dict, meta: dict, tiles=None):
    """Host-side REFERENCE decoder for the ``run_mask`` contract (numpy;
    O(pairs) python — for validation and as executable documentation of
    the bit layout, not for production consumption, which should stay on
    device).

    Returns ``(counts, nbrs)``: ``counts[(si, orig_local_i)]`` is the
    neighbor total and ``nbrs`` maps each query's CONCATENATED original
    index to a sorted numpy array of its neighbors' concatenated original
    indices (union over the query set's active candidate sets — split by
    ``meta['set_offsets']`` for per-pair views).  ``tiles`` restricts the
    decode to a subset of tile indices (sampled validation at scale).
    """
    from .pallas_pairs import LENS_OFF
    pack, n_win = meta["pack"], meta["n_win"]
    n = meta["n_total"]
    desc = np.asarray(mask["desc"])
    bits_t = np.asarray(mask["bits_tiles"])
    bits_f = np.asarray(mask["bits_fat"])
    fat_slot = np.asarray(mask["fat_slot"])
    q_orig = np.asarray(mask["q_orig"])
    cand_orig = np.asarray(mask["cand_orig"])
    fbits = np.arange(pack, dtype=np.int32)
    out = {}
    for t in (range(bits_t.shape[0]) if tiles is None else tiles):
        fs = int(fat_slot[t]) if t < fat_slot.shape[0] else -1
        B = bits_f[fs] if fs >= 0 else bits_t[t]
        rows = B.shape[0] // n_win
        starts = desc[t, :n_win]
        ph0 = starts % pack
        # (n_win*rows,) window id and in-window row of every mask row
        w_ids = np.repeat(np.arange(n_win), rows)
        r_mod = np.tile(np.arange(rows), n_win)
        rr, ll = np.nonzero(B)
        if rr.size == 0:
            continue
        v = B[rr, ll]
        for k in range(pack):
            sel = (v >> fbits[k]) & 1 > 0
            if not sel.any():
                continue
            rs, ls = rr[sel], ll[sel]
            off = r_mod[rs] * pack + (k - ph0[w_ids[rs]])
            slots = starts[w_ids[rs]] + off
            qi = q_orig[t * 128 + ls]
            cj = cand_orig[slots]
            for a, b in zip(qi.tolist(), cj.tolist()):
                out.setdefault(a, []).append(b)
    nbrs = {a: np.sort(np.asarray(v, np.int64)) for a, v in out.items()
            if a < n}
    counts = {a: len(v) for a, v in nbrs.items()}
    return counts, nbrs
