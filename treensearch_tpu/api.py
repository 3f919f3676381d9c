"""Public API — the ``TreeNSearch`` class.

Mirrors the reference public surface (``TreeNSearch/source/TreeNSearch.h:28-427``)
with Python/JAX ergonomics: point sets are numpy or jax arrays (float32 or
float64 — doubles are cast to float32 at ingest exactly like the reference's
cast-copy, ``TreeNSearch.cpp:270-297``; ``README.md:144-146`` documents the
resulting ~1e-7 relative misclassification tolerance), and the whole
build+query step runs as one jit-compiled XLA program (``ops/pipeline.py``).

Differences by design (TPU-first, documented for reference users):
  - ``run()`` and ``run_scalar()`` both exist and produce identical
    neighbor sets (like the reference's SIMD/scalar pair,
    ``README.md:11-12``); here they differ only in pipeline tile size
    (``run_scalar`` is the small-tile XLA reference path, ``run`` the
    throughput path).
  - ``set_n_threads`` / ``set_recursion_cap`` /
    ``set_n_points_for_parallel_octree`` are accepted for API parity and
    recorded, but thread/tree granularity does not exist on TPU; the
    equivalent performance knobs are ``set_chunk_size`` and the padding
    caps (``set_neighbor_cap`` / ``set_candidate_cap``), which the engine
    also grows automatically on overflow (recompile-on-overflow,
    SURVEY.md §7 step 7).
  - ``apply_zsort`` reorders numpy arrays in place (pointer semantics of
    the reference, ``TreeNSearch.h:443-481``) and additionally *returns*
    the reordered array (for jax arrays, which are immutable).
  - errors raise Python exceptions instead of ``exit(-1)``
    (``TreeNSearch.cpp:366-392``).
"""

from __future__ import annotations

import math
import os
import sys
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import SearchConfig, round_up
from .neighborlist import NeighborList, NeighborSolution
from .ops.fastpath import (FastKnobs, ReduceSpec, _pallas_applicable,
                           _pallas_statics, attach_blocks,
                           build_and_search_fast_carry_jit,
                           build_and_search_fast_carry_mask_jit,
                           build_and_search_fast_carry_reduce_jit,
                           build_and_search_fast_jit, default_tiles_cap,
                           make_fast_carry0)
from .ops.grid import GridState, fresh_state
from .ops.pipeline import build_and_search_jit
from .ops.zsort import (apply_order, apply_order_batch, zsort_order,
                        zsort_orders)
from .utils.keys import MAX_CELLS_PER_DIM

import os as _os

_DEBUG_REGROW = _os.environ.get("TNS_DEBUG_REGROW", "") == "1"
_DEFAULT_NBR_CAP = 80
_DEFAULT_CAND_CAP = 512
_DEFAULT_CHUNK = 1024
_DEFAULT_CHUNK_SCALAR = 128
_MAX_GROW_ROUNDS = 16
_MAX_DENSE_CAP = 1 << 26  # 256 MB table; beyond this fall back to searches


class _PointSet:
    __slots__ = ("points", "radii", "n")

    def __init__(self, points, radii, n):
        self.points = points
        self.radii = radii
        self.n = n


def _as_points(points, n_points: Optional[int]):
    """Accept (n,3), flat xyzxyz, numpy or jax, f32/f64; return (obj, n)."""
    if isinstance(points, (np.ndarray, jnp.ndarray)):
        arr = points
    else:
        arr = np.asarray(points)
    if arr.ndim == 1:
        if arr.shape[0] % 3 != 0:
            raise ValueError("flat coordinate array length must be 3*n")
        n = arr.shape[0] // 3
    elif arr.ndim == 2 and arr.shape[1] == 3:
        n = arr.shape[0]
    else:
        raise ValueError(f"points must be (n, 3) or flat xyzxyz, got {arr.shape}")
    if n_points is not None and n_points != n:
        raise ValueError(f"n_points={n_points} does not match array ({n})")
    return arr, n


class TreeNSearch:
    """TPU-native neighborhood search over multiple 3D point sets.

    Multi-chip: pass ``mesh=`` (a ``jax.sharding.Mesh``) or call
    ``distribute(mesh)`` and every subsequent ``run()`` executes the
    domain-decomposed engines of ``parallel/sharded.py`` (i-slab
    ownership, fixed-cap ``all_to_all`` routing, ``ppermute`` halos) with
    the same automated overflow settling as single-chip.  The API surface
    is unchanged — the reference exposes everything through one class
    (``TreeNSearch.h:28-427``) and so does this engine.
    """

    def __init__(self, mesh=None, mesh_axis: str = "d"):
        self._sets: List[_PointSet] = []
        self._active: np.ndarray = np.zeros((0, 0), dtype=bool)
        self._variable: Optional[bool] = None  # None until first set added
        self._symmetric = True                 # reference default (h:385)
        self._search_radius: Optional[float] = None
        self._cell_size: Optional[float] = None
        self._nbr_cap = _DEFAULT_NBR_CAP
        self._nbr_caps: dict = {}      # per-candidate-set overrides
        self._cand_cap = _DEFAULT_CAND_CAP
        self._chunk = _DEFAULT_CHUNK
        self._chunk_scalar = _DEFAULT_CHUNK_SCALAR
        # fast-path knobs, seeded from the FastKnobs defaults (single
        # source of truth; settled values are carried into make_step_fn)
        _kd = FastKnobs._field_defaults
        self._tile = _kd["tile"]
        self._group = _kd["group"]
        self._wcap = _kd["wcap"]
        self._dense_cap: Optional[int] = None  # sized from N on first run
        # fused Pallas pair kernel (ops/pallas_pairs.py): on TPU by default
        self._use_pallas = jax.default_backend() not in ("cpu",)
        self._pallas_interpret = False
        self._fat_wcap = _kd["fat_wcap"]
        self._fat_cap = _kd["fat_cap"]
        self._pre_cap = _kd["pre_cap"]
        self._pre_edge = _kd["pre_edge"]
        self._tiles_cap: Optional[int] = None  # sized from N on first run
        self._pack = _kd["pack"]
        self._tps = _kd["tps"]
        self._rows_cap = _kd["rows_cap"]
        self._mxu_prefix = _kd["mxu_prefix"]
        self._packed_carry = _kd["packed_carry"]
        self._phase_prefix = _kd["phase_prefix"]
        self._rec_wide = _kd["rec_wide"]
        self._lane_batch = _kd["lane_batch"]
        self._lane_batch_user = False  # set_lane_batch disables the auto
        self._brick = tuple(_kd["brick"])
        self._brick_user = False   # set_brick disables the auto-select
        self._use_carry = True     # temporal-coherence carry in run()
        self._scalar_f64 = False   # run_scalar d^2 accumulation in f64
        self._wcap_user = False    # set_window_cap disables the auto-tune
        self._wcap_tuned = False   # one-shot wcap auto-tune from win_hist
        self._dense_snug = False   # one-shot dense-table shrink to domain
        self._fat_snug = False     # one-shot fat-tier wcap shrink to data
        self._tiles_snug = False   # one-shot tile-slot shrink to the
        #                            measured layout (the 25% default
        #                            slack rides every per-slot gather)
        self._tiles_auto = False   # tiles_cap was auto-sized (snug ok)
        self._shared_compact = _kd["shared_compact"]
        self._split_stage = _kd["split_stage"]
        self._rec_expand = _kd["rec_expand"]
        self._rec_expand_user = False  # explicit override disables auto
        self._pack_user = False    # set_record_pack disables the heuristic
        self._grid_state: GridState = fresh_state()
        self._fast_carry = None        # FastCarry (temporal coherence)
        self._carry_key = None
        self._solution: Optional[NeighborSolution] = None
        self._zsort_maps: Optional[List[jnp.ndarray]] = None
        self._last_stats: dict = {}
        # accepted-for-parity knobs (no TPU meaning; see module docstring)
        self._n_threads = len(jax.devices())
        self._recursion_cap = 1000
        self._n_points_for_parallel_octree = 200000
        # multi-chip (parallel/sharded.py): mesh + routing-bucket slack
        # (settled by the overflow loop like every other cap)
        self._mesh = None
        self._mesh_axis = mesh_axis
        self._route_slack = 2.5
        if mesh is not None:
            self.distribute(mesh, mesh_axis)

    # ------------------------------------------------------------ multi-chip
    def distribute(self, mesh, axis: str = "d") -> None:
        """Execute every search over a ``jax.sharding.Mesh`` (domain
        decomposition with halo exchange over ICI; parallel/sharded.py).
        ``run()`` then uses the sharded fast engine when the Pallas gate
        admits the config, else the sharded reference pipeline, and
        settles route/tile/window/neighbor caps through the same regrow
        loop as single-chip.  Pass ``mesh=None`` to return to
        single-device execution."""
        if mesh is not None and axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
        self._mesh = mesh
        self._mesh_axis = axis
        # the carry is a single-device structure
        self._fast_carry = None
        self._carry_key = None
        self._solution = None

    def get_mesh(self):
        return self._mesh

    # ------------------------------------------------------------------ sets
    def add_point_set(self, points, radii=None, n_points: int = None) -> int:
        """Add a point set; returns its id.  With ``radii`` the engine is in
        variable-radius mode; mixing modes raises (reference
        ``TreeNSearch.h:43`` warning / ``_check`` exit)."""
        arr, n = _as_points(points, n_points)
        want_variable = radii is not None
        if self._variable is not None and self._variable != want_variable:
            raise ValueError(
                "cannot mix fixed-radius and variable-radius point sets")
        if want_variable and np.shape(radii)[0] != n:
            raise ValueError("radii length must equal the number of points")
        self._variable = want_variable
        self._sets.append(_PointSet(arr, radii, n))
        s = len(self._sets)
        grown = np.zeros((s, s), dtype=bool)
        grown[: s - 1, : s - 1] = self._active
        # reference default: a new set participates in no searches
        # (TreeNSearch.cpp:357-361)
        self._active = grown
        self._invalidate()
        return s - 1

    def resize_point_set(self, set_id: int, points, radii=None,
                         n_points: int = None) -> None:
        """Replace a set's data (and size), reference ``resize_point_set``
        (``TreeNSearch.cpp:67-133``)."""
        self._require_set(set_id)
        arr, n = _as_points(points, n_points)
        if (radii is not None) != bool(self._variable):
            raise ValueError("resize must match the engine's radius mode")
        if radii is not None and np.shape(radii)[0] != n:
            raise ValueError("radii length must equal the number of points")
        cur = self._sets[set_id]
        if arr is cur.points and radii is cur.radii and n == cur.n:
            # same buffers, same size: no-op, solution stays valid
            # (reference pointer-equality early-out,
            # TreeNSearch.cpp:77-79,90-92,107-109,126-128)
            return
        self._sets[set_id] = _PointSet(arr, radii, n)
        self._invalidate()

    # ---------------------------------------------------------------- config
    def set_search_radius(self, search_radius: float) -> None:
        if self._variable:
            raise ValueError(
                "set_search_radius is for fixed-radius mode; this engine has "
                "variable-radius point sets")
        self._search_radius = float(search_radius)

    def set_cell_size(self, cell_size: float) -> None:
        if cell_size <= 0:
            raise ValueError("cell_size must be positive")
        self._cell_size = float(cell_size)
        self._grid_state = fresh_state()  # keys change; drop hysteresis

    def set_symmetric_search(self, activate: bool) -> None:
        self._symmetric = bool(activate)

    def set_all_searches(self, active: bool = True) -> None:
        self._active[:, :] = bool(active)

    def set_active_search(self, set_i: int, *args, **kwargs) -> None:
        """Two overloads, as in the reference (``TreeNSearch.cpp:219-232``):

        ``set_active_search(i, j, active=True)`` — one directed edge.
        ``set_active_search(i, search_in_all=True, be_found_by_all=True)``
        — writes set_i's full row and column (order dependent).
        """
        self._require_set(set_i)
        if args and isinstance(args[0], (int, np.integer)) \
                and not isinstance(args[0], (bool, np.bool_)):
            set_j = int(args[0])
            active = bool(args[1]) if len(args) > 1 else \
                bool(kwargs.get("active", True))
            self._require_set(set_j)
            self._active[set_i, set_j] = active
        else:
            search_in_all = bool(args[0]) if args else \
                bool(kwargs.get("search_in_all", True))
            be_found_by_all = bool(args[1]) if len(args) > 1 else \
                bool(kwargs.get("be_found_by_all", True))
            self._active[set_i, :] = search_in_all
            self._active[:, set_i] = be_found_by_all
            if not search_in_all:
                self._active[set_i, set_i] = False

    # parity knobs (see module docstring)
    def set_n_threads(self, n: int) -> None:
        self._n_threads = int(n)

    def set_recursion_cap(self, cap: int) -> None:
        self._recursion_cap = int(cap)

    def set_n_points_for_parallel_octree(self, n: int = 200000) -> None:
        self._n_points_for_parallel_octree = int(n)

    # TPU-native performance knobs
    def set_chunk_size(self, chunk: int) -> None:
        if chunk < 8:
            raise ValueError("chunk must be >= 8")
        self._chunk = int(chunk)

    def set_neighbor_cap(self, cap: int, set_j: int = None) -> None:
        """Padded neighbor-list cap.  With ``set_j`` the cap applies to
        neighbor lists AGAINST that candidate set only — candidate sets of
        very different density (fluid vs boundary) then get right-sized
        outputs on the Pallas path instead of all paying the densest
        set's footprint.  Caps auto-grow on overflow either way."""
        if set_j is None:
            self._nbr_cap = int(cap)
        else:
            self._require_set(set_j)
            self._nbr_caps[set_j] = int(cap)

    def _cap_of(self, sj: int) -> int:
        return self._nbr_caps.get(sj, self._nbr_cap)

    def set_candidate_cap(self, cap: int) -> None:
        self._cand_cap = int(cap)

    def set_use_pallas(self, enabled: bool, interpret: bool = False) -> None:
        """Toggle the fused Pallas pair kernel (default: on for TPU).
        ``interpret=True`` runs it in the Pallas interpreter (CPU tests)."""
        self._use_pallas = bool(enabled)
        self._pallas_interpret = bool(interpret)

    def set_window_cap(self, wcap: int) -> None:
        """Fix the narrow-tier candidate-window cap (slots per stencil-row
        window).  By default the engine auto-tunes it from the first run's
        window-length histogram; setting it explicitly disables that."""
        if wcap < 16:
            raise ValueError("window cap must be >= 16")
        self._wcap = int(wcap)
        self._wcap_user = True

    def set_record_pack(self, pack: int) -> None:
        """Candidate-record packing: points per 128-lane record row.
        Higher packs divide the kernel's window DMA traffic and record
        memory (measured best: 16 with the lane-batched pipeline at 1M,
        benchmarks/probe_r5b.out); must divide 16.  Auto-chosen from N
        unless set."""
        if pack not in (1, 2, 4, 8, 16):
            raise ValueError("pack must be one of 1, 2, 4, 8, 16")
        self._pack = int(pack)
        self._pack_user = True

    def set_coherence(self, enabled: bool) -> None:
        """Toggle the temporal-coherence carry inside ``run()`` (default
        on).  Off saves the carried structures' memory and the rebuild
        branch's liveness — useful at the 10M+ scale where HBM is the
        binding constraint and every step moves points anyway."""
        self._use_carry = bool(enabled)
        if not enabled:
            self._fast_carry = None
            self._carry_key = None

    def set_prestage_caps(self, center: int, edge: int = None) -> None:
        """Per-window pre-compaction staging widths of the Pallas kernel
        (center window vs edge windows).  Auto-grown on overflow; presetting
        them avoids regrow recompiles at very large N (minutes at 10M)."""
        self._pre_cap = int(center)
        self._pre_edge = int(edge if edge is not None else center)

    def set_tiles_per_step(self, tps: int) -> None:
        """Narrow-tier query tiles per Pallas grid step (pipeline-overhead
        amortization; measured best 2 at 1M points)."""
        if tps not in (1, 2, 4, 8):
            raise ValueError("tiles_per_step must be 1, 2, 4 or 8")
        self._tps = int(tps)

    def set_brick(self, dims) -> None:
        """Query-tile layout: ``None``/``()`` = row-aligned tiles,
        ``(BI, BJ, BK)`` = brick tiles (queries grouped by compact
        BI x BJ x BK cell bricks; per-query candidate volume drops
        ~2-3x on dense data — see ops/fastpath.py FastKnobs.brick).
        Auto-selected from the measured cell occupancy unless set."""
        if dims is None:
            dims = ()
        dims = tuple(int(d) for d in dims)
        if dims and (len(dims) != 3 or any(d < 1 for d in dims)):
            raise ValueError("brick dims must be three positive ints")
        self._brick = dims
        self._brick_user = True

    def set_lane_batch(self, enabled: bool) -> None:
        """Toggle the lane-batched kernel pipeline (one contiguous window
        buffer, one prefix matmul and one compaction network per phase —
        amortizes the measured per-window fixed costs ~9x; 130 -> 115
        ms/step at 1M with pack=16, benchmarks/probe_r5b.out).  Auto-chosen
        with the record pack unless set explicitly."""
        self._lane_batch = bool(enabled)
        self._lane_batch_user = True

    def set_split_stage(self, enabled: bool) -> None:
        """Toggle the two-pass kernel: a mask-mode pass 1 bit-packs the
        pair masks in tile layout; a pass-2 kernel unpacks them and runs
        the staging compaction + merge (see FastKnobs.split_stage).
        Results are bit-identical to the fused kernel; applies to
        lane-batched single-chip configs (incl. shared-compaction
        multi-set staging) outside the reduce / mask contracts.
        MEASURED SLOWER than the fused kernel at 1M on v5e
        (benchmarks/NOTES.md round 5, session 2) — kept as a knob for
        future hardware/compiler generations."""
        self._split_stage = bool(enabled)

    # ---------------------------------------------------------------- run
    def run(self) -> None:
        """Execute the search and build all active neighbor lists
        (reference ``run()``, ``TreeNSearch.cpp:138-149``).  Uses the
        dense-table fast path (``ops/fastpath.py``); falls back to the
        search-based reference path for domains too sparse for a dense
        cell table."""
        self._run(self._chunk, fast=True)

    def run_scalar(self) -> None:
        """Identical results through the search-based reference pipeline
        (role of the reference's scalar implementations,
        ``TreeNSearch.cpp:150-160``)."""
        self._run(self._chunk_scalar, fast=False)

    def set_scalar_double_accum(self, enabled: bool) -> None:
        """``run_scalar`` distance test with the reference SCALAR path's
        float64 d^2 accumulation (``TreeNSearch.cpp:2080-2086``: the
        non-SIMD loop sums ``double squared_distance``; r^2 stays the
        f32 square, promoted — matching C++'s implicit conversion).
        The SIMD/Pallas engines keep f32 semantics by design (SURVEY.md
        §7 targets the reference's SIMD float comparisons).  Requires
        x64 enabled in JAX (``jax.config.update("jax_enable_x64",
        True)``) — without it the cast is a silent no-op, so this
        setter raises."""
        if enabled and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "set_scalar_double_accum(True) needs jax_enable_x64; "
                'call jax.config.update("jax_enable_x64", True) first')
        self._scalar_f64 = bool(enabled)

    def run_reduce(self, fn: Callable, n_out: int = 1,
                   payload=None) -> dict:
        """FUSED NEIGHBOR-REDUCE — the device-side visitor.

        Evaluates ``fn`` over every neighbor pair the active searches
        would emit and sums its outputs per query point INSIDE the pair
        kernel: no neighbor list is materialized, no compaction runs —
        for accumulation-style consumers (SPH density/forces, counting,
        local statistics) this skips the most expensive stages of
        ``run()``.  TPU-native role of the reference visitor pattern
        ``for_each_neighbor`` (``TreeNSearch.h:221-258``,
        ``TreeNSearch.cpp:2571-2596``), fused into the search.

        ``fn(env) -> array | tuple of n_out arrays``: a JAX-traceable
        elementwise function of the env dict (``dx, dy, dz, d2`` = the
        candidate-minus-query displacement and squared distance, f32;
        ``r2_i``; ``orig_i/orig_j``, ``set_i/set_j`` int32; per-point
        payload planes ``p0_i, p1_i, p0_j, p1_j``; plus ``r_j`` in
        variable mode).  Outputs are summed in f32 over the query's
        exact neighbor set (self is excluded, as in ``run()``).  The
        SAME ``fn`` OBJECT keys the compile cache — define it once.

        ``payload``: optional per-set sequence of (n_i,) or (n_i, <=2)
        float arrays riding the two spare record fields (e.g. particle
        masses), visible to ``fn`` as ``p0_j/p1_j`` (candidate side) and
        ``p0_i/p1_i`` (query side).

        Returns ``{set_index: (n_i, n_out) float32 array}``.  Caps
        settle/regrow exactly as in ``run()`` (window overflow re-routes
        through the fat tier and regrows); results are exact for any
        cap state.
        """
        self._check()
        points, radii = self._assemble()
        cell = self._effective_cell_size()
        sr = self._search_radius if not self._variable else 0.0
        w = self._stencil_w(cell)
        pl_arr = self._assemble_payload(payload)
        rs = ReduceSpec(fn, int(n_out), payload is not None)
        sol = self._execute(points, radii, sr, cell, w, self._chunk,
                            True, reduce_spec=rs, payload=pl_arr)
        out = {}
        for si in range(len(self._sets)):
            out[si] = np.asarray(sol["reduce"][f"s{si}"]).T
        self._last_stats = {
            "n_cells": int(sol["n_cells"]),
            "cand_max": int(sol["cand_max"]),
            "max_count": 0,
            "cell_size": cell,
            "stencil_w": w,
            "path": "reduce",
        }
        return out

    def run_mask(self) -> tuple[dict, dict]:
        """TILE-LAYOUT BITMASK output — the zero-compaction contract.

        Executes the search but returns the pair masks BIT-PACKED in the
        kernel's native tile layout instead of compacted per-point
        neighbor lists: the staging networks, MXU prefixes and merge —
        the dominant kernel terms of ``run()`` (benchmarks/NOTES.md
        round 5) — never run, and the output cannot truncate (no
        neighbor caps exist).  For consumers that process neighbors with
        their own device code (custom Pallas kernels, XLA segment ops),
        this is the fastest full-information contract; accumulation-style
        consumers should prefer ``run_reduce`` (no materialization at
        all).  Complements the reference's CSR output
        (``TreeNSearch.cpp:2474-2493``) rather than mirroring it.

        Returns ``(mask, meta)``.  ``mask`` holds device arrays:

        - ``bits_tiles`` (tiles, n_win*wcap//pack, 128) i32 and
          ``bits_fat`` (fat_cap, n_win*fat_wcap//pack, 128) i32: bit f of
          row ``w*wrows + r``, lane ``l`` says candidate slot
          ``desc[t, w] + r*pack + f - desc[t, w] % pack`` is a neighbor
          of the tile's lane-``l`` query (self excluded, active-matrix
          applied — exactly the pairs ``run()`` emits).  Tiles with
          ``fat_slot[t] >= 0`` use ``bits_fat[fat_slot[t]]``.
        - ``counts`` {"s<i>": (n_i,) i32}: exact per-query neighbor
          totals in original point order; ``counts_flat`` the same in
          padded-slot order.
        - ``desc`` (window starts in candidate-slot space + lengths at
          column 64 + FAT flag), ``fat_slot``, ``fat_ids``, ``qpos``
          (original point -> padded slot), ``q_orig``/``q_set`` (per
          padded slot), ``cand_orig`` (candidate slot -> concatenated
          original index; padding decodes to ``meta['n_total']``).

        ``meta`` holds the static geometry: pack, wcap, fat_wcap, n_win,
        n_total, set_offsets, set_sizes.  A host-side reference decoder
        is ``ops.fastpath.decode_mask(mask, meta)``.

        Caps settle/regrow exactly as in ``run()``; results are exact
        for any cap state.  Single-chip Pallas path only.
        """
        self._check()
        points, radii = self._assemble()
        cell = self._effective_cell_size()
        sr = self._search_radius if not self._variable else 0.0
        w = self._stencil_w(cell)
        sol = self._execute(points, radii, sr, cell, w, self._chunk,
                            True, mask_out=True)
        cfg = self._make_cfg(self._chunk, self._stencil_w(cell))
        knobs = self._knobs(self._use_pallas)._replace(lane_batch=True)
        st = _pallas_statics(cfg, knobs)
        meta = {"pack": st["pack"], "wcap": st["wcap"],
                "fat_wcap": st["fat_wcap"], "n_win": len(st["offs_2d"]),
                "n_total": self.get_total_n_points(),
                "set_offsets": cfg.set_offsets,
                "set_sizes": cfg.set_sizes}
        self._last_stats = {
            "n_cells": int(sol["n_cells"]),
            "cand_max": int(sol["cand_max"]),
            "max_count": 0,
            "cell_size": cell,
            "stencil_w": w,
            "path": "mask",
        }
        return sol["mask"], meta

    def _assemble_payload(self, payload):
        """Per-set payload columns -> one (n_total, 2) f32 device array
        (zero-padded), aligned with ``_assemble``'s concatenation."""
        if payload is None:
            return None
        if len(payload) != len(self._sets):
            raise ValueError("payload must have one entry per point set")
        cols = []
        for s, p in zip(self._sets, payload):
            a = np.zeros((s.n, 2), np.float32)
            if p is not None:
                p = np.asarray(p, np.float32)
                if p.ndim == 1:
                    p = p[:, None]
                if p.shape[0] != s.n or p.shape[1] > 2:
                    raise ValueError(
                        f"payload shape {p.shape} does not match set "
                        f"size {s.n} (max 2 columns)")
                a[:, :p.shape[1]] = p
            cols.append(a)
        return jnp.asarray(np.concatenate(cols, axis=0))

    def _run(self, chunk: int, fast: bool = True) -> None:
        self._check()
        points, radii = self._assemble()
        cell = self._effective_cell_size()
        sr = self._search_radius if not self._variable else 0.0
        w = self._stencil_w(cell)
        sol = self._execute(points, radii, sr, cell, w, chunk, fast)
        attach_blocks(sol)   # re-link the once-returned shared blocks
        max_count = max(
            (int(p["max_count"]) for p in sol["pairs"].values()), default=0)
        self._solution = NeighborSolution(sol["pairs"], self._nbr_cap)
        self._last_stats = {
            "n_cells": int(sol["n_cells"]),
            "cand_max": int(sol["cand_max"]),
            "max_count": max_count,
            "cell_size": cell,
            "stencil_w": w,
            "path": "fast" if (fast and "dense_overflow" in sol) else "reference",
        }
        if "win_hist" in sol:  # Pallas path: window-length histogram
            self._last_stats["win_hist"] = np.asarray(sol["win_hist"])

    def _default_dense_cap(self) -> int:
        # SPH-like data occupies ~N/20 cells at the default cell size;
        # N/2 table slots leave ample headroom and grow on overflow.
        n = max(self.get_total_n_points(), 1)
        cap = 1 << 16
        while cap < n // 2 and cap < _MAX_DENSE_CAP:
            cap <<= 1
        return cap

    def _knobs(self, use_pallas: bool) -> FastKnobs:
        return FastKnobs(tile=self._tile, group=self._group,
                         wcap=self._wcap,
                         dense_cap=self._dense_cap,
                         use_pallas=use_pallas,
                         interpret=self._pallas_interpret,
                         fat_wcap=self._fat_wcap,
                         fat_cap=self._fat_cap,
                         pre_cap=self._pre_cap,
                         pre_edge=self._pre_edge,
                         tiles_cap=self._tiles_cap,
                         pack=self._pack,
                         tps=self._tps,
                         rows_cap=self._rows_cap,
                         mxu_prefix=self._mxu_prefix,
                         packed_carry=self._packed_carry,
                         phase_prefix=self._phase_prefix,
                         rec_wide=self._rec_wide,
                         lane_batch=self._lane_batch,
                         shared_compact=self._shared_compact,
                         split_stage=self._split_stage,
                         rec_expand=self._rec_expand,
                         brick=self._brick)

    def _execute(self, points, radii, sr, cell, w, chunk, fast,
                 reduce_spec=None, payload=None, mask_out=False):
        """Run one search with overflow-regrow; returns the clean solution."""
        use_fast = fast
        use_pallas_now = self._use_pallas
        if not self._pack_user:
            # measured on v5e: lane_batch + pack=16 best at 1M (114.8 vs
            # 130.0 ms/step, benchmarks/probe_r5b.out); pack=16 records
            # (32 B/point) also where memory dominates (10M)
            n_tot = self.get_total_n_points()
            self._pack = 16 if n_tot >= 200_000 else 1
        if not self._lane_batch_user:
            # the lane-batched pipeline amortizes per-window fixed costs
            # and wins at pack >= 8 (regresses at pack <= 4: fewer rows
            # per window starve the wide operands; probe_r5b B1 vs B2)
            self._lane_batch = self._pack >= 8
        if not self._rec_expand_user:
            # DMA-expand record build: replaces the (NPAD, 8) row gather
            # + opad index gather with contiguous copies (104.5 -> 94.3
            # ms/step at 1M, benchmarks/bench_r7h_rexp1.out); brick /
            # raw / sharded paths gate it off internally, and small-n
            # (pack < 8) engines keep the gather build (gathers are not
            # the bottleneck there)
            self._rec_expand = self._pack >= 8 and not self._brick
        if self._dense_cap is None:
            self._dense_cap = self._default_dense_cap()
        if self._tiles_cap is None:
            self._tiles_cap = default_tiles_cap(
                max(self.get_total_n_points(), 1))
            self._tiles_auto = True
        for _ in range(_MAX_GROW_ROUNDS):
            cfg = self._make_cfg(chunk, w)
            if mask_out:
                knobs = self._knobs(use_pallas_now)._replace(
                    lane_batch=True)
                if not use_fast or not _pallas_applicable(cfg, knobs) \
                        or cfg.n_points == 0 or self._mesh is not None:
                    raise NotImplementedError(
                        "run_mask requires the single-chip Pallas fast "
                        "path (<= 8 candidate sets, n > 0, no mesh)")
                carry = self._get_carry(cfg, knobs)
                sol, state, carry = build_and_search_fast_carry_mask_jit(
                    points, radii, jnp.float32(sr), jnp.float32(cell),
                    self._grid_state, carry, cfg, knobs)
                self._fast_carry = carry
            elif reduce_spec is not None:
                knobs = self._knobs(use_pallas_now)._replace(
                    lane_batch=True)
                if not use_fast or not _pallas_applicable(cfg, knobs) \
                        or cfg.n_points == 0:
                    raise NotImplementedError(
                        "run_reduce requires the Pallas fast path "
                        "(<= 8 candidate sets, n > 0)")
                if self._mesh is not None:
                    from .parallel.sharded import (
                        build_and_search_sharded_reduce_jit)
                    sol, state = build_and_search_sharded_reduce_jit(
                        points, radii, jnp.float32(sr), jnp.float32(cell),
                        self._grid_state, cfg, self._mesh, knobs,
                        reduce_spec, self._mesh_axis, self._route_slack,
                        payload=payload)
                else:
                    carry = self._get_carry(cfg, knobs)
                    sol, state, carry = \
                        build_and_search_fast_carry_reduce_jit(
                            points, radii, payload, jnp.float32(sr),
                            jnp.float32(cell), self._grid_state, carry,
                            cfg, knobs, reduce_spec)
                    self._fast_carry = carry
            elif self._mesh is not None:
                # multi-chip: domain-decomposed engines with the same
                # settling loop (route_slack joins the settled caps)
                from .parallel.sharded import (
                    build_and_search_sharded_fast_jit,
                    build_and_search_sharded_jit)
                knobs = self._knobs(use_pallas_now)
                if use_fast and _pallas_applicable(cfg, knobs) \
                        and cfg.n_points > 0:
                    sol, state = build_and_search_sharded_fast_jit(
                        points, radii, jnp.float32(sr), jnp.float32(cell),
                        self._grid_state, cfg, self._mesh, knobs,
                        self._mesh_axis, self._route_slack)
                else:
                    sol, state = build_and_search_sharded_jit(
                        points, radii, jnp.float32(sr), jnp.float32(cell),
                        self._grid_state, cfg, self._mesh,
                        self._mesh_axis, self._route_slack)
            elif use_fast:
                knobs = self._knobs(use_pallas_now)
                if self._use_carry and _pallas_applicable(cfg, knobs) \
                        and cfg.n_points > 0:
                    # temporal-coherence path: the carried cell structure
                    # is reused when no point changed cells (staleness is
                    # detected on device each call, so no host-side
                    # invalidation is needed beyond shape changes)
                    carry = self._get_carry(cfg, knobs)
                    sol, state, carry = build_and_search_fast_carry_jit(
                        points, radii, jnp.float32(sr), jnp.float32(cell),
                        self._grid_state, carry, cfg, knobs)
                    self._fast_carry = carry
                else:
                    sol, state = build_and_search_fast_jit(
                        points, radii, jnp.float32(sr), jnp.float32(cell),
                        self._grid_state, cfg, knobs)
            else:
                sol, state = build_and_search_jit(
                    points, radii, jnp.float32(sr), jnp.float32(cell),
                    self._grid_state, cfg)
            if _DEBUG_REGROW:
                print("[regrow] flags:", {
                    k: int(sol[k]) for k in
                    ("error", "dense_overflow", "tile_overflow",
                     "straddle", "cand_max", "pallas_used")
                    if k in sol},
                    {"pre_surv": int(sol.get("pre_surv_max", -1)),
                     "max_count": max((int(p["max_count"])
                                       for p in sol["pairs"].values()),
                                      default=0),
                     "wcap": self._wcap, "fat": (self._fat_wcap,
                                                self._fat_cap),
                     "pre": self._pre_cap, "nbr": self._nbr_cap,
                     "tiles": self._tiles_cap}, flush=True)
            if int(sol["error"]) != 0:
                self._grid_state = fresh_state()
                raise RuntimeError(
                    f"the world box exceeds {MAX_CELLS_PER_DIM} cells per "
                    "axis; increase the cell size (reference aborts here, "
                    "TreeNSearch.cpp:510-515)")
            if int(sol.get("route_overflow", 0)) != 0:
                # sharded routing-bucket cap exceeded (a slab owns more
                # than route_slack x the uniform share); double the slack
                # and re-run — the same settle-and-rerun contract as every
                # other cap (VERDICT r3 item 3)
                self._route_slack *= 2.0
                sol = None
                continue
            if use_fast and int(sol.get("dense_overflow", 0)) != 0:
                if self._dense_cap < _MAX_DENSE_CAP:
                    self._dense_cap = min(self._dense_cap * 8, _MAX_DENSE_CAP)
                else:
                    use_fast = False  # domain too sparse for a dense table
                sol = None  # release before re-running (10M solutions are GBs)
                continue
            if use_fast and int(sol.get("rows_overflow", 0)) != 0:
                # more occupied-grid rows than the row-array budget
                auto = max(1 << 14, self._dense_cap >> 3)
                self._rows_cap = (2 * auto if self._rows_cap == 0
                                  else 2 * self._rows_cap)
                self._rows_cap = min(self._rows_cap, self._dense_cap + 1)
                sol = None
                continue
            if use_fast and int(sol.get("tile_overflow", 0)) != 0:
                # more occupied grid rows than the row-aligned layout's
                # padded-slot budget; grow and re-trace
                self._tiles_cap = int(self._tiles_cap * 1.5) + 64
                sol = None  # release before re-running (10M solutions are GBs)
                continue
            if use_fast and int(sol.get("straddle", 0)) != 0:
                # a tile spans >= 3 grid rows. The pallas kernel's tile is
                # fixed at 128, so straddle there means the dataset's rows
                # are too short for it -> try the XLA tile loop at its
                # MINIMUM tile once (straddle there means even 8-point
                # tiles span 3+ rows), then the search-based reference
                # path.  Each fallback step is a fresh trace (~3 s), so
                # jumping straight to tile=8 instead of halving 128->8
                # saves 3 re-traces on sparse/short-row data.
                if use_pallas_now:
                    use_pallas_now = False
                elif self._tile > 8:
                    self._tile = 8
                else:
                    use_fast = False
                sol = None  # release before re-running (10M solutions are GBs)
                continue
            # ---- batched cap growth ------------------------------------
            # These signals are TRUE maxima computed from the window /
            # survivor geometry (independent of any output truncation), so
            # every exceeded cap can grow from ONE solution and re-run
            # ONCE.  The structural overflows above (dense/rows/tile/
            # straddle) stay one-at-a-time: their solutions are not
            # trustworthy enough to read secondary signals from.  Growing
            # caps one per re-run cost one full trace+compile+run per cap
            # (minutes at 10M; the r3 config-5 first run paid 4).
            grew = False
            cand_max = int(sol["cand_max"])
            if use_fast and int(sol.get("pallas_used", 0)) != 0:
                if cand_max > 0:
                    # two-tier pallas overflow: too many fat tiles or a
                    # window wider than the fat tier
                    self._fat_cap *= 2
                    self._fat_wcap = max(
                        self._fat_wcap,
                        round_up(int(cand_max * 1.25) + 1, 128))
                    grew = True
                pre_surv = int(sol.get("pre_surv_max", 0))
                if pre_surv > self._pre_cap:
                    self._pre_cap = round_up(int(pre_surv * 1.25) + 1, 8)
                    grew = True
                pre_surv_e = int(sol.get("pre_surv_edge_max", 0))
                if pre_surv_e > self._pre_edge:
                    self._pre_edge = round_up(int(pre_surv_e * 1.25) + 1, 8)
                    grew = True
            # the sharded reference pipeline can serve a use_fast request
            # (when the Pallas gate rejects the config); its windows are
            # bounded by cand_cap, not wcap — distinguish by the fast
            # path's signature flag
            fast_sol = use_fast and "dense_overflow" in sol
            cand_limit = self._wcap if fast_sol else self._cand_cap
            if cand_max > cand_limit and not (
                    use_fast and int(sol.get("pallas_used", 0)) != 0):
                grown = round_up(int(cand_max * 1.25) + 1, 64)
                if fast_sol:
                    self._wcap = grown
                else:
                    self._cand_cap = grown
                grew = True
            for (si, sj) in (cfg.active_pairs
                             if reduce_spec is None and not mask_out
                             else ()):
                mc = int(sol["pairs"][f"{si}-{sj}"]["max_count"])
                if mc > self._cap_of(sj):
                    new_cap = round_up(int(mc * 1.25) + 1, 16)
                    if sj in self._nbr_caps or self._nbr_caps:
                        self._nbr_caps[sj] = new_cap
                    else:
                        self._nbr_cap = new_cap
                    grew = True
            if grew:
                sol = None  # release before re-running (10M solutions are GBs)
                continue
            if use_fast and int(sol.get("pallas_used", 0)) != 0:
                self._post_run_tune(sol, state, w)
            self._grid_state = state
            return sol
        raise RuntimeError(
            "padding caps failed to converge "
            f"(wcap={self._wcap}, cand_cap={self._cand_cap}, "
            f"nbr_cap={self._nbr_cap}, dense_cap={self._dense_cap})")

    def _get_carry(self, cfg, knobs):
        """Return the carried FastCarry if it is still valid for this
        exact (cfg, knobs), else a fresh invalid one.  The key must cover
        EVERY static the carry CONTENT depends on, not just its shapes:
        a carry built at one window cap holds that cap's fat-tier routing,
        and reusing it after the wcap auto-tune made the narrow kernel
        truncate 241..369-slot windows at 1M (12,245 pairs silently lost;
        benchmarks/validate_1m_r5.out first failure).  Keying on the full
        config/knob tuples costs at most one in-graph rebuild per knob
        change.  Staleness of the content under identical statics (points
        moving) is still detected on device."""
        key = (cfg, knobs._replace(skip_stage=0, probe_mode=0))
        if getattr(self, "_carry_key", None) != key \
                or self._fast_carry is None:
            self._fast_carry = make_fast_carry0(cfg, knobs)
            self._carry_key = key
        return self._fast_carry

    def _post_run_tune(self, sol: dict, state, w: int) -> None:
        """One-shot knob tuning from the first successful Pallas run.

        - ``wcap`` auto-tune: pick the smallest window cap covering the
          p95 of nonzero window lengths (measured best at 1M,
          benchmarks/probe_r3e; the remaining ~5% of windows route to
          the auto-growing fat tier), from the device-computed
          window-length histogram.  Disabled by ``set_window_cap``
          (explicit user choice).
        - dense-table snug: shrink the dense cell table to the measured
          domain (the default is sized from N, which over-allocates by the
          occupancy factor); the table histogram/scan cost per step is
          proportional to the static cap, so this trims prep time.
        Both change static caps for the NEXT compile only.
        """
        if not self._wcap_tuned and not self._wcap_user \
                and "win_hist" in sol:
            hist = np.asarray(sol["win_hist"])
            total = int(hist.sum())
            if total > 0:
                # p95 of nonzero window lengths: measured best at 1M
                # (192 -> 176 ms vs 288 -> 190 ms, benchmarks/probe_r3e);
                # the ~2% of tiles whose windows spill route to the
                # auto-growing fat tier
                cum = np.cumsum(hist)
                idx = int(np.searchsorted(cum, 0.95 * total))
                # align so each window is a whole number of 8-sublane
                # record rows at the chosen pack (wrows = wcap/pack; the
                # measured-best 1M config is exactly this: pack=16 ->
                # wcap 256, benchmarks/probe_r5b/c).  Brick histograms
                # use 8-slot bins (windows are a few cells long).
                bin_w = 8 if self._brick else 32
                align = max(8, 8 * self._pack)
                tuned = max(32, round_up((idx + 1) * bin_w, align))
                # compare against the EFFECTIVE cap (_pallas_statics
                # rounds wcap up to whole record rows): at pack=16 the
                # 288 default runs as 384, and tuning must judge 384,
                # not 288 (the gap cost 146 vs 115 ms/step at 1M)
                eff = round_up(self._wcap, align)
                if tuned < eff * 0.88 or tuned > eff:
                    self._wcap = tuned
            self._wcap_tuned = True
        if not self._fat_snug and "win_max" in sol:
            # fat-tier cap snug: the default fat_wcap (1024) is sized for
            # row-tile windows; brick windows are a few cells long, and a
            # fat tile costs ~fat_wcap/wcap times a narrow tile — size the
            # fat tier to the MEASURED widest window instead.  Growth on
            # later overflow still goes through the cand_max regrow.
            wm = int(sol["win_max"])
            if wm > 0:
                align = max(128, 8 * self._pack)
                snug_fat = round_up(int(wm * 1.25) + self._pack, align)
                if snug_fat < self._fat_wcap:
                    self._fat_wcap = snug_fat
            self._fat_snug = True
        if not self._dense_snug:
            k = np.asarray(state.n_cells).astype(np.int64)
            needed = int((k[0] + 2 * w) * (k[1] + 2 * w) * (k[2] + 2 * w))
            snug = 1 << max(16, int(np.ceil(np.log2(max(needed, 1) * 1.35))))
            if snug < self._dense_cap:
                self._dense_cap = snug
            self._dense_snug = True
        if not self._tiles_snug and self._tiles_auto \
                and self._mesh is None and "tiles_used" in sol:
            # (sharded runs skip this: owned-slab filtering marks
            # interior tiles dead, so used tiles are not a suffix there)
            # tile-slot snug: the auto default carries ~25% slack, and
            # every per-slot cost (the padded record gather, the kernel
            # grid, the routing scans) is proportional to the static cap.
            # 4% + 32 headroom absorbs occupancy drift between steps; a
            # real overflow still regrows through tile_overflow.
            used = int(sol["tiles_used"])
            if os.environ.get("BENCH_VERBOSE"):
                print(f"[tune] tiles_used={used} cap={self._tiles_cap}",
                      file=sys.stderr)
            if used > 0:
                snug = round_up(int(used * 1.04) + 32, max(8, self._tps))
                if snug < self._tiles_cap:
                    self._tiles_cap = snug
            self._tiles_snug = True

    # ------------------------------------------------------------- queries
    def get_neighborlist(self, set_i: int, set_j: int, i: int) -> NeighborList:
        self._require_solution()
        return self._solution.get_neighborlist(set_i, set_j, i)

    def for_each_neighbor(self, set_i: int, set_j: int, i: int,
                          f: Callable[[int], None]) -> None:
        for j in self.get_neighborlist(set_i, set_j, i):
            f(j)

    def get_neighbors(self, set_i: int, set_j: int):
        """Bulk device interface: (counts (n_i,), padded nbrs (n_i, cap))."""
        self._require_solution()
        return self._solution.get_neighbors_device(set_i, set_j)

    def get_counts(self, set_i: int, set_j: int) -> np.ndarray:
        """Neighbor counts only — does NOT materialize the per-point
        neighbor view (which is GBs for a dense pair at 10M points)."""
        self._require_solution()
        return self._solution.get_counts(set_i, set_j)

    def get_neighborlist_n_bytes(self) -> int:
        self._require_solution()
        return self._solution.n_bytes()

    # ---------------------------------------------------------------- zsort
    def prepare_zsort(self) -> None:
        """Compute per-set Morton reorder maps (reference ``prepare_zsort``,
        ``TreeNSearch.cpp:2571-2661``).

        Like the reference, this takes the CELL-GRANULAR fast path when
        the cells of the last run are available (``TreeNSearch.cpp:
        2598-2657``): the carried cell assignment is decoded and sorted
        at cell granularity (points of one cell stay in order) with no
        world-box reduction or re-quantization — see
        ``ops.zsort.zsort_orders_from_cells``.  Without a valid carry
        (no run yet, carry disabled, points resized, or mesh mode) it
        computes the exact per-point 2^20 Morton order (the reference's
        refined no-tree path, ``TreeNSearch.cpp:2663-2716``)."""
        if not self._sets:
            raise RuntimeError("no point sets added")
        carry = self._fast_carry
        sizes_now = tuple(s.n for s in self._sets)
        if (carry is not None and bool(carry.valid)
                and self._carry_key is not None
                and self._carry_key[0].set_sizes == sizes_now
                and self._last_stats.get("path") == "fast"):
            from .ops.zsort import zsort_orders_from_cells
            w = int(self._last_stats.get("stencil_w", 1))
            nc = self._grid_state.n_cells
            dy, dz = nc[1] + 2 * w, nc[2] + 2 * w
            offs, lins = 0, []
            for s in self._sets:
                lins.append(jax.lax.slice_in_dim(carry.lin_chk, offs,
                                                 offs + s.n))
                offs += s.n
            self._zsort_maps = zsort_orders_from_cells(lins, dy, dz)
            return
        mins, maxs = [], []
        pts_dev = []
        for s in self._sets:
            p = jnp.asarray(s.points, jnp.float32).reshape(-1, 3)
            pts_dev.append(p)
            if s.n > 0:
                mins.append(jnp.min(p, axis=0))
                maxs.append(jnp.max(p, axis=0))
        if mins:
            box_min = jnp.min(jnp.stack(mins), axis=0)
            box_max = jnp.max(jnp.stack(maxs), axis=0)
        else:
            box_min = jnp.zeros((3,), jnp.float32)
            box_max = jnp.ones((3,), jnp.float32)
        # all per-set orders in ONE device program/dispatch
        self._zsort_maps = zsort_orders(pts_dev, box_min, box_max)

    @staticmethod
    def _needs_host_gather(arr) -> bool:
        """True for numpy arrays whose dtype the device path would narrow
        (f64 -> f32, i64/u64 -> 32-bit) under jax's default x64-off config.
        The reference ``apply_zsort<T>`` is exact for ANY element type
        (``TreeNSearch.h:443-481``); wide dtypes take an exact host-side
        gather instead of the device dispatch."""
        if not isinstance(arr, np.ndarray) or jax.config.jax_enable_x64:
            return False
        dt = arr.dtype
        return (dt.kind in "iufc") and dt.itemsize > 4

    def apply_zsort(self, set_i: int, data, stride: int = 1):
        """Reorder a user array by the prepared Z-order.  numpy arrays are
        updated in place (reference pointer semantics); the reordered array
        is always returned.  Bit-exact for every input dtype: f32/i32
        ride the fused device gather; wide numpy dtypes (f64, i64, ...)
        are gathered on the host so no value is narrowed (reference
        ``apply_zsort<T>`` exactness, ``TreeNSearch.h:443-481``)."""
        self._require_set(set_i)
        if self._zsort_maps is None:
            raise RuntimeError(
                "prepare_zsort() must be called before apply_zsort() "
                "(reference exits here, TreeNSearch.h:446-454)")
        order = self._zsort_maps[set_i]
        n = order.shape[0]
        if n == 0:
            return data
        is_np = isinstance(data, np.ndarray)
        arr = data
        size = int(np.prod(np.shape(arr)))
        if size % n != 0:
            raise ValueError(
                f"array of {size} elements cannot be reordered for set "
                f"{set_i} with {n} points (need n*stride elements)")
        flat_in = hasattr(arr, "ndim") and arr.ndim == 1 and stride > 1
        if self._needs_host_gather(arr):
            rows = arr.reshape(n, stride) if flat_in else arr.reshape(n, -1)
            out = np.take(rows, np.asarray(order), axis=0)
            np.copyto(data, out.reshape(data.shape))
            return data
        rows = jnp.asarray(arr).reshape(n, -1) if not flat_in \
            else jnp.asarray(arr).reshape(n, stride)
        out = apply_order(rows, order)
        out = out.reshape(np.shape(arr))
        if is_np:
            np.copyto(data, np.asarray(out).astype(data.dtype, copy=False))
            return data
        return out

    def apply_zsort_batch(self, set_i: int, arrays: Sequence,
                          strides: Optional[Sequence[int]] = None):
        """Reorder MANY user arrays by the prepared Z-order in one device
        program (one dispatch; ``apply_zsort`` per array costs a host
        round-trip each — prohibitive through a remote TPU link).  numpy
        arrays are updated in place; the reordered arrays are returned."""
        self._require_set(set_i)
        if self._zsort_maps is None:
            raise RuntimeError(
                "prepare_zsort() must be called before apply_zsort_batch()")
        order = self._zsort_maps[set_i]
        n = order.shape[0]
        if n == 0 or not arrays:
            return list(arrays)
        strides = list(strides) if strides is not None else [1] * len(arrays)
        rows_list, dev_idx = [], []
        host_out = {}
        order_np = None
        for k, (arr, stride) in enumerate(zip(arrays, strides)):
            size = int(np.prod(np.shape(arr)))
            if size % n != 0:
                raise ValueError(
                    f"array of {size} elements cannot be reordered for "
                    f"set {set_i} with {n} points")
            if self._needs_host_gather(arr):
                # exact host gather for wide dtypes (f64/i64/...): the
                # device path would narrow them (see apply_zsort)
                if order_np is None:
                    order_np = np.asarray(order)
                flat_in = arr.ndim == 1 and stride > 1
                rows = arr.reshape(n, stride) if flat_in \
                    else arr.reshape(n, -1)
                host_out[k] = np.take(rows, order_np, axis=0)
                continue
            a = jnp.asarray(arr)
            flat_in = a.ndim == 1 and stride > 1
            rows_list.append(a.reshape(n, stride) if flat_in
                             else a.reshape(n, -1))
            dev_idx.append(k)
        outs_dev = apply_order_batch(rows_list, order) if rows_list else []
        outs = [None] * len(arrays)
        for k, out in zip(dev_idx, outs_dev):
            outs[k] = out
        results = []
        for k, arr in enumerate(arrays):
            if k in host_out:
                np.copyto(arr, host_out[k].reshape(arr.shape))
                results.append(arr)
                continue
            out = outs[k].reshape(np.shape(arr))
            if isinstance(arr, np.ndarray):
                np.copyto(arr, np.asarray(out).astype(arr.dtype,
                                                      copy=False))
                results.append(arr)
            else:
                results.append(out)
        return results

    def get_zsort_order(self, set_i: int) -> np.ndarray:
        self._require_set(set_i)
        if self._zsort_maps is None:
            raise RuntimeError("prepare_zsort() has not been called")
        return np.asarray(self._zsort_maps[set_i])

    # -------------------------------------------------------------- getters
    def get_n_sets(self) -> int:
        return len(self._sets)

    def get_n_threads(self) -> int:
        return self._n_threads

    def get_n_points_in_set(self, set_i: int) -> int:
        self._require_set(set_i)
        return self._sets[set_i].n

    def get_total_n_points(self) -> int:
        return sum(s.n for s in self._sets)

    def is_search_active(self, set_i: int, set_j: int) -> bool:
        self._require_set(set_i)
        self._require_set(set_j)
        return bool(self._active[set_i, set_j])

    def does_set_exist(self, set_i: int) -> bool:
        return 0 <= set_i < len(self._sets)

    # ---------------------------------------------------------- diagnostics
    def print_state(self) -> None:
        """Dump options and structure/neighborhood statistics (reference
        ``print_state``, ``TreeNSearch.cpp:2718-2873``: options, world
        boxes, cell stats, active searches, per-set AABB/radius/neighbor
        stats, list memory)."""
        print("TreeNSearch (treensearch_tpu) state")
        print(f"  n_sets: {len(self._sets)}  total points: "
              f"{self.get_total_n_points()}")
        mode = "variable" if self._variable else "fixed"
        print(f"  radius mode: {mode}  symmetric: {self._symmetric}")
        if not self._variable:
            print(f"  search radius: {self._search_radius}")
        print(f"  cell size: {self._cell_size or '(default 1.5*r_min)'}")
        print(f"  caps: nbr={self._nbr_cap} window={self._wcap} "
              f"fat=({self._fat_wcap},{self._fat_cap}) "
              f"dense={self._dense_cap} chunk={self._chunk}")
        print("  active searches: "
              + str([(int(i), int(j))
                     for (i, j) in zip(*np.nonzero(self._active))]))
        gs = self._grid_state
        if bool(gs.valid):
            k = np.asarray(gs.n_cells)
            print(f"  world box: {np.asarray(gs.grid_min).round(5)} .. "
                  f"{np.asarray(gs.grid_max).round(5)}  cells/axis: {k}")
            if self._last_stats.get("n_cells"):
                nc = self._last_stats["n_cells"]
                npts = self.get_total_n_points()
                print(f"  occupied cells: {nc}  avg points/cell: "
                      f"{npts / max(nc, 1):.2f}")
            # per-cell occupancy min/max/avg (reference cell statistics,
            # TreeNSearch.cpp:2718-2873), recomputed on demand so the hot
            # loop never pays for diagnostics
            cell = self._last_stats.get("cell_size")
            if cell and self.get_total_n_points() > 0:
                p_all = np.concatenate(
                    [np.asarray(s.points, np.float32).reshape(-1, 3)
                     for s in self._sets if s.n > 0])
                k = np.asarray(gs.n_cells).astype(np.int64)
                gmin = np.asarray(gs.grid_min, np.float32)
                ijk = np.clip(np.floor(
                    (p_all - gmin) * np.float32(1.0 / cell)).astype(np.int64),
                    0, k - 1)
                lin = (ijk[:, 0] * k[1] + ijk[:, 1]) * k[2] + ijk[:, 2]
                occ = np.unique(lin, return_counts=True)[1]
                print(f"  points per occupied cell min/avg/max = "
                      f"{occ.min()}/{occ.mean():.2f}/{occ.max()}")
        # candidate-window statistics (the role of the reference's leaf
        # size / max ghost span lines): from the last run's device
        # histogram (bins of 32 slots)
        wh = self._last_stats.get("win_hist")
        if wh is not None and int(wh.sum()) > 0:
            cum = np.cumsum(wh)
            tot = int(cum[-1])
            p50 = (int(np.searchsorted(cum, 0.50 * tot)) + 1) * 32
            p95 = (int(np.searchsorted(cum, 0.95 * tot)) + 1) * 32
            wmax = (int(np.nonzero(wh)[0][-1]) + 1) * 32
            print(f"  candidate windows: {tot} nonzero, length p50/p95/max"
                  f" <= {p50}/{p95}/{wmax} slots;"
                  f" stencil reach: {self._last_stats.get('stencil_w')}"
                  " cells (ghost-span analog)")
        if self._last_stats:
            print(f"  last run: {self._last_stats}")
        for k_set, s in enumerate(self._sets):
            if s.n == 0:
                print(f"  set {k_set}: 0 points")
                continue
            p = np.asarray(s.points, dtype=np.float32).reshape(-1, 3)
            line = (f"  set {k_set}: {s.n} points  aabb "
                    f"{p.min(axis=0).round(4)} .. {p.max(axis=0).round(4)}")
            if self._variable:
                r = np.asarray(s.radii, dtype=np.float32)
                line += (f"  radius min/avg/max = {r.min():.4g}/"
                         f"{r.mean():.4g}/{r.max():.4g}")
            print(line)
        if self._solution is not None:
            for (i, j) in zip(*np.nonzero(self._active)):
                c = self._solution.get_counts(int(i), int(j))
                if c.size:
                    print(f"  pair ({i}->{j}): neighbors min/avg/max = "
                          f"{c.min()}/{c.mean():.2f}/{c.max()}")
            print(f"  neighborlist bytes: {self.get_neighborlist_n_bytes()}")

    def profile_run(self, trace_dir: str, n_steps: int = 3) -> str:
        """Capture a ``jax.profiler`` trace of steady-state search steps
        (the TPU-native answer to SURVEY.md §5's tracing gap; the
        reference has no built-in profiler and times with omp_get_wtime).
        View with TensorBoard or Perfetto. Returns the trace directory."""
        self._check()
        if self._solution is None:
            self.run()  # settle caps outside the trace
        points, radii = self._assemble()
        step, state = self.make_step_fn()
        sol, state = step(state, points, radii)  # warm/compile untraced
        jax.block_until_ready(sol)
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                sol, state = step(state, points, radii)
            jax.block_until_ready(sol)
        return trace_dir

    # ------------------------------------------------------ jit-embedding
    def make_step_fn(self, chunk: Optional[int] = None, fast: bool = True,
                     reuse: bool = False, reduce=None,
                     mask_output: bool = False):
        """Return ``(step, state0)`` for embedding the search in a jitted
        simulation loop (e.g. under ``lax.scan``) with zero host sync:

            step(state, points, radii=None) -> (solution_pytree, new_state)

        Shapes/caps are fixed at the current settings; overflow shows up in
        the solution's ``cand_max`` / ``dense_overflow`` / per-pair
        ``max_count`` fields for the caller to check when convenient.
        Call ``run()`` once first to let the caps settle.

        With ``reuse=True`` (Pallas path only) the state is the pair
        ``(grid_state, fast_carry)`` and each step reuses the carried cell
        structure when no point changed cells — the TPU answer to the
        reference's temporal-coherence machinery
        (``TreeNSearch.cpp:417-424``); results are exact either way, and
        ``solution["rebuilt"]`` reports what happened.

        The Pallas-path solution returns the tile-layout neighbor blocks
        ONCE at top level (``blocks``/``qpos_set``/``fat_slot``) instead
        of repeating them per pair — XLA allocates one output buffer per
        pytree occurrence, which tripled output memory at 10M x 3 sets.
        Call ``ops.fastpath.attach_blocks(sol)`` on the host before
        handing pairs to ``materialize_nbrs``/``NeighborSolution``
        (``run()`` does this automatically); ``counts``/``max_count``
        per pair work without it.
        """
        self._check()
        cell = self._effective_cell_size()
        sr = self._search_radius if not self._variable else 0.0
        cfg = self._make_cfg(chunk or self._chunk, self._stencil_w(cell))
        if self._dense_cap is None:
            self._dense_cap = self._default_dense_cap()
        if self._tiles_cap is None:
            self._tiles_cap = default_tiles_cap(
                max(self.get_total_n_points(), 1))
        knobs = self._knobs(self._use_pallas)

        if mask_output:
            # tile-layout bitmask contract step (see run_mask): the state
            # is the temporal-coherence carry pair; the solution carries
            # sol["mask"] instead of per-pair lists.  Call run_mask()
            # once first to settle caps.
            knobs = knobs._replace(lane_batch=True)
            if not (fast and _pallas_applicable(cfg, knobs)
                    and cfg.n_points > 0):
                raise ValueError(
                    "mask_output steps require the Pallas fast path "
                    "(use_pallas on, <= 8 candidate sets, n > 0)")

            def step(state, points, radii=None):
                grid, carry = state
                sol, grid, carry = build_and_search_fast_carry_mask_jit(
                    points, radii, jnp.float32(sr), jnp.float32(cell),
                    grid, carry, cfg, knobs)
                return sol, (grid, carry)

            return step, (fresh_state(), make_fast_carry0(cfg, knobs))

        if reduce is not None:
            # fused neighbor-reduce step (see run_reduce): the state is
            # always the temporal-coherence carry pair, and the step
            # takes an optional per-point payload operand —
            #   step(state, points, radii=None, payload=None)
            # -> ({"reduce": {"s<i>": (n_out, n_i) f32}, ...}, state)
            rs = reduce if isinstance(reduce, ReduceSpec) \
                else ReduceSpec(reduce[0], int(reduce[1]))
            knobs = knobs._replace(lane_batch=True)
            if not (fast and _pallas_applicable(cfg, knobs)
                    and cfg.n_points > 0):
                raise ValueError(
                    "reduce steps require the Pallas fast path "
                    "(use_pallas on, <= 8 candidate sets, n > 0)")

            def step(state, points, radii=None, payload=None):
                grid, carry = state
                sol, grid, carry = build_and_search_fast_carry_reduce_jit(
                    points, radii, payload, jnp.float32(sr),
                    jnp.float32(cell), grid, carry, cfg, knobs, rs)
                return sol, (grid, carry)

            return step, (fresh_state(), make_fast_carry0(cfg, knobs))

        if reuse:
            if not (fast and _pallas_applicable(cfg, knobs)
                    and cfg.n_points > 0):
                raise ValueError(
                    "reuse=True requires the Pallas fast path "
                    "(use_pallas on, <= 8 candidate sets, n > 0)")

            def step(state, points, radii=None):
                grid, carry = state
                sol, grid, carry = build_and_search_fast_carry_jit(
                    points, radii, jnp.float32(sr), jnp.float32(cell),
                    grid, carry, cfg, knobs)
                return sol, (grid, carry)

            return step, (fresh_state(), make_fast_carry0(cfg, knobs))

        def step(state, points, radii=None):
            if fast:
                return build_and_search_fast_jit(
                    points, radii, jnp.float32(sr), jnp.float32(cell),
                    state, cfg, knobs)
            return build_and_search_jit(
                points, radii, jnp.float32(sr), jnp.float32(cell), state, cfg)

        return step, fresh_state()

    # -------------------------------------------------------------- helpers
    def _make_cfg(self, chunk: int, w: int) -> SearchConfig:
        pairs = tuple(
            (int(i), int(j)) for i, j in zip(*np.nonzero(self._active)))
        n_sets = len(self._sets)
        caps = tuple(self._cap_of(j) for j in range(n_sets))
        return SearchConfig(
            set_sizes=tuple(s.n for s in self._sets),
            active_pairs=pairs,
            variable=bool(self._variable),
            symmetric=bool(self._symmetric and self._variable),
            stencil_w=w,
            chunk=chunk,
            cand_cap=self._cand_cap,
            nbr_cap=max(caps) if caps else self._nbr_cap,
            nbr_caps=caps if self._nbr_caps else None,
            scalar_f64=self._scalar_f64,
        )

    def _assemble(self):
        pts = [jnp.asarray(s.points, jnp.float32).reshape(-1, 3)
               for s in self._sets]
        points = jnp.concatenate(pts, axis=0) if pts else \
            jnp.zeros((0, 3), jnp.float32)
        radii = None
        if self._variable:
            rad = [jnp.asarray(s.radii, jnp.float32).reshape(-1)
                   for s in self._sets]
            radii = jnp.concatenate(rad, axis=0) if rad else \
                jnp.zeros((0,), jnp.float32)
        return points, radii

    def _radius_bounds(self):
        if not self._variable:
            r = self._search_radius or 0.0
            return r, r
        r_min, r_max = math.inf, 0.0
        for s in self._sets:
            if s.n == 0:
                continue
            rr = np.asarray(s.radii, dtype=np.float32)
            r_min = min(r_min, float(rr.min()))
            r_max = max(r_max, float(rr.max()))
        if r_min is math.inf:
            r_min = r_max = 0.0
        return r_min, r_max

    def _effective_cell_size(self) -> float:
        if self._cell_size is not None:
            return self._cell_size
        # reference default: 1.5 x (global radius | min radius)
        # (TreeNSearch.cpp:299-316)
        r_min, _ = self._radius_bounds()
        if r_min <= 0:
            raise ValueError("cannot derive a cell size: no positive radius")
        return 1.5 * r_min

    def _stencil_w(self, cell: float) -> int:
        """Stencil half-width: smallest w with w*cell >= r_max, computed
        with the same f32 directed-rounding-safe test as the device-side
        per-tile reach (ops/fastpath.py) — no epsilon slack."""
        _, r_max = self._radius_bounds()
        if r_max <= 0:
            return 1
        c = np.float32(cell)
        r = np.float32(r_max)
        w0 = int(np.floor(r * (np.float32(1.0) / c)))
        w = w0 if np.float32(w0) * c >= r else w0 + 1
        return max(1, w)

    def _check(self) -> None:
        # mirrors _check validation (TreeNSearch.cpp:366-392)
        if not self._sets:
            raise RuntimeError("no point sets have been added")
        if not self._variable and (self._search_radius is None
                                   or self._search_radius <= 0):
            raise RuntimeError(
                "fixed-radius mode requires set_search_radius(r > 0)")
        if self._variable:
            for k, s in enumerate(self._sets):
                if s.n > 0 and float(np.min(np.asarray(s.radii))) < 0:
                    raise RuntimeError(f"set {k} has negative radii")

    def _require_set(self, set_i: int) -> None:
        if not self.does_set_exist(set_i):
            raise IndexError(f"point set {set_i} does not exist")

    def _require_solution(self) -> None:
        if self._solution is None:
            raise RuntimeError("run() has not been called")

    def _invalidate(self) -> None:
        self._solution = None
        self._zsort_maps = None
        # resize/add invalidates cells in the reference
        # (TreeNSearch.cpp:118,364); here the grid hysteresis state stays
        # usable (it only describes the world box), so nothing else to do.
