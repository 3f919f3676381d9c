"""Temporal-coherence carry (FastCarry) exactness tests.

The reference exploits coherence between simulation steps
(``TreeNSearch.cpp:417-424``, persistent buffers ``octree_internals.h:166-211``);
here the carried cell structure is reused only when a stable re-sort would
reproduce it bit-for-bit (identical cell keys + unchanged grid + unchanged
radii), so results must be EXACT in every scenario: full reuse, jiggle
within cells, cell-crossing moves, and radius changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.fastpath import (FastKnobs, attach_blocks,
                                          build_and_search_fast_carry_jit,
                                          build_and_search_fast_jit,
                                          make_fast_carry0,
                                          materialize_nbrs)
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.oracle import BruteforceNSearch


def _counts_nbrs(sol):
    attach_blocks(sol)
    p = dict(sol["pairs"]["0-0"])
    cnt = np.asarray(p["counts"])
    nb = np.asarray(materialize_nbrs(p))
    return cnt, nb


def _assert_same_sets(a, b):
    ca, na = a
    cb, nb = b
    assert np.array_equal(ca, cb)
    for i in range(ca.shape[0]):
        assert np.array_equal(np.sort(na[i][: ca[i]]),
                              np.sort(nb[i][: cb[i]])), i


def test_carry_reuse_and_rebuild_exact():
    rng = np.random.default_rng(5)
    n, r = 300, 0.14
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = SearchConfig((n,), ((0, 0),), False, False, 1, 1024, 512, 96)
    # interpret-mode cost scales with wcap x windows x tiles; windows
    # here are <= ~30 slots, so 64 (vs 256) cuts the python kernel 4x
    knobs = FastKnobs(wcap=64, dense_cap=1 << 14, use_pallas=True,
                      pre_cap=48, pre_edge=48, interpret=True, fat_cap=8,
                      tiles_cap=64)

    def plain(p):
        sol, _ = build_and_search_fast_jit(
            jnp.asarray(p), None, jnp.float32(r), jnp.float32(1.5 * r),
            fresh_state(), cfg, knobs)
        return sol

    carry = make_fast_carry0(cfg, knobs)
    grid = fresh_state()

    # step 1: cold carry -> rebuild
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts), None, jnp.float32(r), jnp.float32(1.5 * r),
        grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 1
    assert int(sol["tile_overflow"]) == 0 and int(sol["rows_overflow"]) == 0
    _assert_same_sets(_counts_nbrs(sol), _counts_nbrs(plain(pts)))

    # step 2: identical points -> reuse, identical results
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts), None, jnp.float32(r), jnp.float32(1.5 * r),
        grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 0
    _assert_same_sets(_counts_nbrs(sol), _counts_nbrs(plain(pts)))

    # step 3: jiggle so small no point changes cells -> reuse, and the
    # results must reflect the NEW coordinates (records are always fresh)
    pts3 = (pts + 1e-6).astype(np.float32)
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts3), None, jnp.float32(r), jnp.float32(1.5 * r),
        grid, carry, cfg, knobs)
    _assert_same_sets(_counts_nbrs(sol), _counts_nbrs(plain(pts3)))

    # step 4: real movement (cell crossings) -> rebuild, exact
    pts4 = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts4), None, jnp.float32(r), jnp.float32(1.5 * r),
        grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 1
    _assert_same_sets(_counts_nbrs(sol), _counts_nbrs(plain(pts4)))

    orc = BruteforceNSearch(search_radius=r)
    orc.add_point_set(pts4)
    orc.set_all_searches(True)
    orc.run()
    cnt, nb = _counts_nbrs(sol)
    for i in range(n):
        assert np.array_equal(np.sort(nb[i][: cnt[i]]),
                              orc.neighbors[(0, 0)][i])


def test_carry_variable_radius_change_triggers_rebuild():
    rng = np.random.default_rng(9)
    n = 250
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    rad = rng.uniform(0.08, 0.16, n).astype(np.float32)
    cell = 1.5 * 0.08
    cfg = SearchConfig((n,), ((0, 0),), True, True, 2, 1024, 512, 128)
    # ~10^3 cells -> ~100 occupied grid rows, each padded to 128 slots:
    # the row-aligned layout needs ~160 tiles here (64 would overflow)
    knobs = FastKnobs(wcap=96, dense_cap=1 << 14, use_pallas=True,
                      pre_cap=64, pre_edge=64, interpret=True, fat_cap=8,
                      tiles_cap=160)
    carry = make_fast_carry0(cfg, knobs)
    grid = fresh_state()
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts), jnp.asarray(rad), jnp.float32(0.0),
        jnp.float32(cell), grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 1
    assert int(sol["tile_overflow"]) == 0 and int(sol["rows_overflow"]) == 0
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts), jnp.asarray(rad), jnp.float32(0.0),
        jnp.float32(cell), grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 0

    # changed radii with unchanged cells MUST rebuild (window reach and
    # the symmetric OR rule depend on radii through the descriptors)
    rad2 = (rad * 0.9).astype(np.float32)
    sol, grid, carry = build_and_search_fast_carry_jit(
        jnp.asarray(pts), jnp.asarray(rad2), jnp.float32(0.0),
        jnp.float32(cell), grid, carry, cfg, knobs)
    assert int(sol["rebuilt"]) == 1

    orc = BruteforceNSearch(search_radius=None, symmetric=True)
    orc.add_point_set(pts, rad2)
    orc.set_all_searches(True)
    orc.run()
    cnt, nb = _counts_nbrs(sol)
    for i in range(n):
        assert np.array_equal(np.sort(nb[i][: cnt[i]]),
                              orc.neighbors[(0, 0)][i])


def test_engine_run_uses_carry_and_stays_exact():
    """Engine-level: repeated run() calls ride the carry; results match
    the oracle before and after point movement."""
    from treensearch_tpu import TreeNSearch

    rng = np.random.default_rng(21)
    n, r = 400, 0.12
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(r)
    eng.set_all_searches(True)
    eng.set_use_pallas(True, interpret=True)
    eng._fat_cap = 16
    eng._tiles_cap = 64
    eng._dense_cap = 1 << 14

    for step_pts in (pts, pts,  # repeat -> reuse path inside
                     (pts + rng.uniform(-0.05, 0.05, pts.shape)
                      .astype(np.float32))):
        eng.resize_point_set(0, step_pts)
        eng.run()
        orc = BruteforceNSearch(search_radius=r)
        orc.add_point_set(step_pts)
        orc.set_all_searches(True)
        orc.run()
        for i in range(0, n, 7):
            got = np.sort(np.asarray(eng.get_neighborlist(0, 0, i)
                                     .to_numpy()))
            assert np.array_equal(got, orc.neighbors[(0, 0)][i]), i


def test_carry_invalidated_by_knob_change():
    """A carried FastCarry bakes in its window cap's FAT-TIER ROUTING;
    reusing it after the cap changes (the wcap auto-tune between the
    first and second run) must rebuild, not reuse.  Regression for the
    1M headline validation failure (12,245 pairs silently truncated;
    benchmarks/validate_1m_r5.out first attempt): run 1 at a wide cap
    routes a dense cluster's tiles narrow, run 2 at a snug cap must
    re-route them fat — a stale carry truncates their windows instead."""
    from treensearch_tpu import TreeNSearch

    rng = np.random.default_rng(11)
    r = 0.08
    cluster = (np.asarray([0.18, 0.18, 0.5], np.float32)
               + 0.004 * rng.standard_normal((300, 3))).astype(np.float32)
    sparse = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    sparse[:, :2] *= 0.36
    pts = np.concatenate([cluster, sparse])
    n = pts.shape[0]

    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(r)
    eng.set_all_searches(True)
    eng.set_use_pallas(True, interpret=True)
    eng.set_neighbor_cap(384)
    eng.set_prestage_caps(384, 384)
    eng._fat_cap = 16
    eng._tiles_cap = 64
    eng._dense_cap = 1 << 14
    eng.set_window_cap(512)   # cluster windows fit the narrow tier
    eng.run()
    # what the auto-tune does between runs: shrink the cap in place
    eng._wcap = 96            # cluster windows now MUST route fat
    eng.run()
    c2 = np.asarray(eng.get_counts(0, 0))

    orc = BruteforceNSearch(search_radius=r)
    orc.add_point_set(pts)
    orc.set_all_searches(True)
    orc.run()
    exp = np.asarray([orc.neighbors[(0, 0)][i].size for i in range(n)])
    assert np.array_equal(c2, exp), (
        f"{int((c2 != exp).sum())} points truncated by stale carry")
