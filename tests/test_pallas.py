"""Pallas pair-kernel logic tests (interpreter mode on CPU).

The real-TPU compile/perf of the kernel is exercised by bench.py; these
tests validate kernel LOGIC hermetically: the in-VMEM cumsum/compaction
primitives, FULL-point oracle parity of the cell-run-tile kernel (v3 has
no straddle fallback — every point is covered by construction), the
multi-set/multi-pair emission, and the fat tier (reference analogs: the
multi-set suites ``tests/tests.cpp:114-145`` and the recursion-cap sweeps
``tests/tests.cpp:69-86``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.fastpath import (FastKnobs, attach_blocks,
                                          build_and_search_fast_jit,
                                          materialize_nbrs)
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.ops.pallas_pairs import _compact_sub, _cumsum_sub
from treensearch_tpu.oracle import BruteforceNSearch


def test_kernel_cumsum_and_compact_primitives():
    rng = np.random.default_rng(0)

    def k1(x_ref, o_ref):
        o_ref[:] = _cumsum_sub(x_ref[:], x_ref.shape[0])

    x = jnp.asarray(rng.integers(0, 3, (128, 8)).astype(np.int32))
    out = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct((128, 8),
                                                            jnp.int32),
                         interpret=True)(x)
    assert np.array_equal(np.asarray(out), np.cumsum(np.asarray(x), axis=0))

    def k2(m_ref, v_ref, o_ref):
        o_ref[:] = _compact_sub(m_ref[:] > 0, v_ref[:], 16)

    m = rng.integers(0, 2, (128, 8)).astype(np.int32)
    v = rng.integers(0, 999, (128, 8)).astype(np.int32)
    out = np.asarray(pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((16, 8), jnp.int32),
        interpret=True)(jnp.asarray(m), jnp.asarray(v)))
    for c in range(8):
        want = v[:, c][m[:, c] > 0][:16]
        want = np.concatenate([want, -np.ones(16 - len(want), np.int32)])
        assert np.array_equal(out[:, c], want)


def _run_fast(pts_np, rad_np, r, cell, cfg, knobs):
    sol, _ = build_and_search_fast_jit(
        jnp.asarray(pts_np),
        jnp.asarray(rad_np) if rad_np is not None else None,
        jnp.float32(0.0 if rad_np is not None else r), jnp.float32(cell),
        fresh_state(), cfg, knobs)
    assert int(sol["pallas_used"]) == 1
    assert int(sol["straddle"]) == 0
    assert int(sol["tile_overflow"]) == 0
    return attach_blocks(sol)


def _assert_pair_parity(sol, orc, si, sj, n_i):
    cnt = np.asarray(sol["pairs"][f"{si}-{sj}"]["counts"])
    nb = np.asarray(materialize_nbrs(sol["pairs"][f"{si}-{sj}"]))
    for i in range(n_i):
        got = np.sort(nb[i][: cnt[i]])
        assert np.array_equal(got, orc.neighbors[(si, sj)][i]), (si, sj, i)


@pytest.mark.parametrize(
    "variable,pack,phase_prefix,lane_batch,brick,rec_expand", [
        # every row is a PRODUCTION-REACHABLE static combination (engine
        # auto: pack=1 per-window small-n, pack=16 lane_batch large-n;
        # users can pin pack=4 per-window / lane_batch at any pack).  Rows
        # are pruned to one per distinct kernel branch — each row is a
        # separate ~45-100 s XLA compile of the interpret program, the
        # dominant suite cost (benchmarks/NOTES.md round-4 suite notes).
        (True, 1, False, False, (), False),   # variable+symm, per-window
        (False, 4, True, False, (), False),   # packed per-window
        (False, 16, True, False, (), False),  # pack16 per-window
        # lane_batch pack16 + DMA-expand record build (1M/10M production)
        (False, 16, True, True, (), True),
        (True, 4, True, True, (), True),      # lane_batch var+symm, expand
        (True, 1, False, True, (), False),    # lane_batch pack1
        # v6 BRICK query tiles (multi-center self-exclusion, brick-major
        # query layout vs plain sorted candidates)
        (False, 8, True, True, (2, 2, 3), False),
        (True, 4, True, True, (2, 2, 2), False),
    ])
def test_pallas_kernel_oracle_parity(variable, pack, phase_prefix,
                                     lane_batch, brick, rec_expand):
    """FULL-point exact parity (v3 cell-run tiles cover every point).

    Slab geometry (thin in x/y, long in z): the interpreter executes one
    grid step per 128-slot tile, and the row-aligned layout pads every
    occupied (i, j) row to 128 slots — a cube of this n costs ~50 mostly
    empty rows, a 3x3-row slab ~16 full tiles for the same code paths
    (multi-row stencils, boundary ghost padding, full oracle parity)."""
    rng = np.random.default_rng(3)
    # the variable case runs a 5x5 stencil (25 windows), so it gets a
    # lower density / snugger wcap to keep the interpreter affordable
    n, r = (600, 0.09) if variable else (1200, 0.09)
    pts_np = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts_np[:, :2] *= 0.42   # ~3-4 cells per horizontal axis
    rad_np = rng.uniform(0.8 * r, 1.2 * r, n).astype(np.float32) \
        if variable else None
    cell = 1.5 * (rad_np.min() if variable else r)
    w = 2 if variable else 1
    cfg = SearchConfig((n,), ((0, 0),), variable, variable, w,
                       1024, 512, 96)
    # small fat/tile caps: the interpreter executes every grid step in
    # Python, so the defaults (fat_cap=1024) would cost minutes per call
    knobs = FastKnobs(wcap=160 if variable else 256, dense_cap=1 << 14,
                      use_pallas=True,
                      pre_cap=96, pre_edge=96, interpret=True, fat_cap=8,
                      fat_wcap=512, tiles_cap=64 if brick else 48,
                      pack=pack,
                      phase_prefix=phase_prefix, lane_batch=lane_batch,
                      brick=brick, rec_expand=rec_expand)
    sol = _run_fast(pts_np, rad_np, r, cell, cfg, knobs)
    assert int(sol["pairs"]["0-0"]["max_count"]) <= 96

    orc = BruteforceNSearch(search_radius=None if variable else r,
                            symmetric=variable)
    orc.add_point_set(pts_np, rad_np)
    orc.set_all_searches(True)
    orc.run()
    _assert_pair_parity(sol, orc, 0, 0, n)


@pytest.mark.parametrize("pack,phase_prefix,lane_batch,brick,rec_expand", [
    (1, False, False, (), False),
    # multi-set candidate-set blocks through the per-phase MXU prefix
    # path: per-block phase masks with running offsets must stay exact
    (4, True, False, (), False),
    # multi-set through the lane-batched pipeline (production default at
    # pack >= 8): SHARED-compaction combined staging + per-block
    # extraction, with the DMA-expand record build on top
    (4, True, True, (), True),
    # multi-set through brick tiles (per-block masks over 16 windows)
    (8, True, True, (2, 2, 3), False),
])
def test_pallas_multi_pair_asymmetric_matrix(pack, phase_prefix,
                                             lane_batch, brick,
                                             rec_expand):
    """Two sets, asymmetric 3-pair active matrix (1->1 off) through the
    kernel's per-pair emission (reference tests.cpp:114-145)."""
    rng = np.random.default_rng(7)
    n0, n1, r = 700, 500, 0.1
    p0 = rng.uniform(0, 1, (n0, 3)).astype(np.float32)
    p1 = rng.uniform(0, 1, (n1, 3)).astype(np.float32)
    p0[:, :2] *= 0.45   # slab geometry (see oracle-parity test)
    p1[:, :2] *= 0.45
    pairs = ((0, 0), (0, 1), (1, 0))
    cfg = SearchConfig((n0, n1), pairs, False, False, 1, 1024, 512, 96)
    knobs = FastKnobs(wcap=384, dense_cap=1 << 14, use_pallas=True,
                      pre_cap=96, pre_edge=48, interpret=True, fat_cap=8,
                      fat_wcap=512, tiles_cap=64 if brick else 48,
                      pack=pack,
                      phase_prefix=phase_prefix, lane_batch=lane_batch,
                      brick=brick, rec_expand=rec_expand)
    pts = np.concatenate([p0, p1])
    sol = _run_fast(pts, None, r, 1.5 * r, cfg, knobs)

    orc = BruteforceNSearch(search_radius=r)
    orc.add_point_set(p0)
    orc.add_point_set(p1)
    for (si, sj) in pairs:
        orc.set_active_search(si, sj, True)
    orc.run()
    for (si, sj) in pairs:
        _assert_pair_parity(sol, orc, si, sj, (n0, n1)[si])


def test_pallas_fat_tier_exact():
    """A dense cluster inside a sparse cloud forces fat-tier tiles
    (windows wider than the narrow wcap); parity must stay exact."""
    rng = np.random.default_rng(11)
    r = 0.08
    cluster = (np.asarray([0.18, 0.18, 0.5], np.float32)
               + 0.004 * rng.standard_normal((400, 3))).astype(np.float32)
    sparse = rng.uniform(0, 1, (600, 3)).astype(np.float32)
    sparse[:, :2] *= 0.36   # slab geometry (see oracle-parity test)
    pts = np.concatenate([cluster, sparse])
    n = pts.shape[0]
    cfg = SearchConfig((n,), ((0, 0),), False, False, 1, 1024, 512, 512)
    # wcap deliberately below the cluster's window width -> fat tier
    knobs = FastKnobs(wcap=96, fat_wcap=1024, fat_cap=16,
                      dense_cap=1 << 14, use_pallas=True, pre_cap=448,
                      pre_edge=448, interpret=True, tiles_cap=48)
    sol = _run_fast(pts, None, r, 1.5 * r, cfg, knobs)
    assert int(sol["cand_max"]) == 0  # fat tier absorbed the wide windows

    orc = BruteforceNSearch(search_radius=r)
    orc.add_point_set(pts)
    orc.set_all_searches(True)
    orc.run()
    _assert_pair_parity(sol, orc, 0, 0, n)


def test_record_build_wide_narrow_identical():
    """The wide (lane-pad before gather) and narrow (gather then pad)
    record-build schedules must produce bit-identical q_t / rec_pad —
    only their speed differs (benchmarks/probe_r4c.py)."""
    from treensearch_tpu.ops.fastpath import _build_records

    rng = np.random.default_rng(5)
    n, npad = 300, 512
    rec8 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (n + 1, 8),
                                    dtype=np.int64).astype(np.int32))
    opad = jnp.asarray(rng.integers(0, n + 1, (npad,), dtype=np.int64)
                       .astype(np.int32))
    for pack in (2, 4, 16):
        lpp = 128 // pack
        qa, ra = jax.jit(_build_records, static_argnums=(2, 3))(
            rec8, opad, lpp, False)
        qb, rb = jax.jit(_build_records, static_argnums=(2, 3))(
            rec8, opad, lpp, True)
        assert np.array_equal(np.asarray(qa), np.asarray(qb)), pack
        assert np.array_equal(np.asarray(ra), np.asarray(rb)), pack


def test_pallas_tile_overflow_flag():
    """tiles_cap below the row-aligned layout's need must raise the
    tile_overflow flag (host regrows on it)."""
    rng = np.random.default_rng(13)
    n, r = 1000, 0.05
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = SearchConfig((n,), ((0, 0),), False, False, 1, 1024, 512, 96)
    knobs = FastKnobs(wcap=256, dense_cap=1 << 14, use_pallas=True,
                      pre_cap=96, interpret=True, tiles_cap=4,
                      fat_cap=16)
    sol, _ = build_and_search_fast_jit(
        jnp.asarray(pts), None, jnp.float32(r), jnp.float32(1.5 * r),
        fresh_state(), cfg, knobs)
    assert int(sol["tile_overflow"]) == 1
