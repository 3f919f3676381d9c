"""Multi-chip path: exact parity with the single-device program on a
virtual 8-device CPU mesh (the driver separately dry-runs this via
__graft_entry__.dryrun_multichip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.fastpath import (FastKnobs,
                                          build_and_search_fast_jit)
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.ops.pipeline import build_and_search_jit
from treensearch_tpu.parallel.sharded import (build_and_search_sharded,
                                              build_and_search_sharded_fast)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("d",))


@pytest.mark.parametrize("variable", [False, True])
def test_sharded_matches_single_device(variable):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    n0, n1 = 700, 300
    pts = rng.uniform(0, 1, (n0 + n1, 3)).astype(np.float32)
    rad = rng.uniform(0.08, 0.14, n0 + n1).astype(np.float32) \
        if variable else None
    cfg = SearchConfig(
        set_sizes=(n0, n1),
        active_pairs=((0, 0), (0, 1), (1, 0)),
        variable=variable, symmetric=variable,
        stencil_w=1, chunk=64, cand_cap=512, nbr_cap=96)
    cell = 1.5 * 0.1

    pts_d = jnp.asarray(pts)
    rad_d = jnp.asarray(rad) if variable else None
    sol1, _ = build_and_search_jit(pts_d, rad_d, jnp.float32(0.1),
                                   jnp.float32(cell), fresh_state(), cfg)

    sharded = jax.device_put(pts_d, NamedSharding(mesh, P("d")))
    sol2, _ = jax.jit(
        lambda p, r, st: build_and_search_sharded(
            p, r, jnp.float32(0.1), jnp.float32(cell), st, cfg, mesh)
    )(sharded, rad_d, fresh_state())

    assert int(sol2["route_overflow"]) == 0
    for name in sol1["pairs"]:
        c1 = np.asarray(sol1["pairs"][name]["counts"])
        c2 = np.asarray(sol2["pairs"][name]["counts"])
        assert np.array_equal(c1, c2), name
        n1_ = np.asarray(sol1["pairs"][name]["nbrs"])
        n2_ = np.asarray(sol2["pairs"][name]["nbrs"])
        # same neighbor SETS per point (padding/order may differ)
        for i in range(n1_.shape[0]):
            assert np.array_equal(np.sort(n1_[i][n1_[i] >= 0]),
                                  np.sort(n2_[i][n2_[i] >= 0])), (name, i)


def test_sharded_memory_is_domain_decomposed():
    """The build must NOT be replicated (the r1 design all_gathered the
    full cloud on every device): routing buffers are O(N/D + halo) per
    device and the per-pair outputs come back sharded over the mesh."""
    mesh = _mesh()
    rng = np.random.default_rng(3)
    n = 4096
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = SearchConfig(set_sizes=(n,), active_pairs=((0, 0),),
                       variable=False, symmetric=False,
                       stencil_w=1, chunk=128, cand_cap=512, nbr_cap=64)
    sharded = jax.device_put(
        jnp.asarray(pts),
        jax.sharding.NamedSharding(mesh, P("d")))
    sol, _ = jax.jit(
        lambda p, st: build_and_search_sharded(
            p, None, jnp.float32(0.07), jnp.float32(0.105), st, cfg, mesh)
    )(sharded, fresh_state())
    assert int(sol["route_overflow"]) == 0
    counts = sol["pairs"]["0-0"]["counts"]
    # outputs are sharded over the mesh, one shard per device
    shard_rows = {s.data.shape[0] for s in counts.addressable_shards}
    assert len(counts.addressable_shards) == mesh.shape["d"]
    assert max(shard_rows) <= -(-n // mesh.shape["d"])
    # sanity: the result is a real search (non-trivial neighbor counts)
    assert int(jnp.sum(counts)) > 0


@pytest.mark.parametrize("variable,production", [
    (False, False), (True, False),
    # PRODUCTION knob set (api auto at n >= 200k): pack 8+, lane-batched
    # kernel, expand record build — the sharded engine no longer forces
    # rec_expand off, so the sorted-window DMA layout must hold under
    # shard_map with slab-local records and global orig/set ids
    (False, True), (True, True),
])
def test_sharded_fast_matches_single_device_fastpath(variable, production):
    """The FLAGSHIP engine sharded (VERDICT r2 item 4): per-device dense
    table over the slab + halos, row-aligned layout, tile-window kernel
    with the owned-row query filter.  Must match the single-device fast
    path exactly on an 8-device CPU mesh (kernel in interpret mode)."""
    mesh = _mesh()
    rng = np.random.default_rng(11)
    n0, n1 = 600, 360  # total divisible by the 8-device mesh
    pts = rng.uniform(0, 1, (n0 + n1, 3)).astype(np.float32)
    rad = rng.uniform(0.09, 0.15, n0 + n1).astype(np.float32) \
        if variable else None
    cfg = SearchConfig(
        set_sizes=(n0, n1),
        active_pairs=((0, 0), (0, 1), (1, 0)),
        variable=variable, symmetric=variable,
        stencil_w=1, chunk=64, cand_cap=512, nbr_cap=96)
    cell = 1.5 * 0.1
    # single-device fast path (interpret kernel)
    # windows of this cloud are <= ~40 slots: wcap 64 (vs 256) cuts
    # the interpret-mode kernel cost 4x at identical coverage
    prod = dict(pack=8, lane_batch=True, rec_expand=True) \
        if production else {}
    knobs1 = FastKnobs(wcap=64, dense_cap=1 << 14, use_pallas=True,
                       pre_cap=48, pre_edge=48, interpret=True,
                       fat_cap=8, tiles_cap=128, **prod)
    pts_d = jnp.asarray(pts)
    rad_d = jnp.asarray(rad) if variable else None
    sol1, _ = build_and_search_fast_jit(
        pts_d, rad_d, jnp.float32(0.1), jnp.float32(cell),
        fresh_state(), cfg, knobs1)
    assert int(sol1["tile_overflow"]) == 0
    from treensearch_tpu.ops.fastpath import attach_blocks, materialize_nbrs
    attach_blocks(sol1)

    # sharded fast path: per-device caps over ~N/8 + halos
    knobs8 = FastKnobs(wcap=64, dense_cap=1 << 13, use_pallas=True,
                       pre_cap=48, pre_edge=48, interpret=True,
                       fat_cap=8, tiles_cap=96, **prod)
    sharded = jax.device_put(pts_d, NamedSharding(mesh, P("d")))
    sol2, _ = jax.jit(
        lambda p, r, st: build_and_search_sharded_fast(
            p, r, jnp.float32(0.1), jnp.float32(cell), st, cfg, mesh,
            knobs8)
    )(sharded, rad_d, fresh_state())
    for flag in ("route_overflow", "tile_overflow", "rows_overflow",
                 "dense_overflow"):
        assert int(sol2[flag]) == 0, flag
    assert int(sol2["cand_max"]) == 0

    for name in sol1["pairs"]:
        p1 = dict(sol1["pairs"][name])
        c1 = np.asarray(p1["counts"])
        n1_ = np.asarray(materialize_nbrs(p1))
        c2 = np.asarray(sol2["pairs"][name]["counts"])
        n2_ = np.asarray(sol2["pairs"][name]["nbrs"])
        assert np.array_equal(c1, c2), name
        for i in range(c1.shape[0]):
            assert np.array_equal(np.sort(n1_[i][: c1[i]]),
                                  np.sort(n2_[i][: c2[i]])), (name, i)


def test_sharded_empty_and_tiny():
    mesh = _mesh()
    cfg = SearchConfig(set_sizes=(3,), active_pairs=((0, 0),),
                       variable=False, symmetric=False,
                       stencil_w=1, chunk=16, cand_cap=64, nbr_cap=16)
    pts = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, 3))
                      .astype(np.float32))
    sol, _ = jax.jit(
        lambda p, st: build_and_search_sharded(
            p, None, jnp.float32(0.5), jnp.float32(0.75), st, cfg, mesh)
    )(pts, fresh_state())
    assert np.asarray(sol["pairs"]["0-0"]["counts"]).shape == (3,)


def _build_engine(p0, r0, p1, r1, mesh=None):
    from treensearch_tpu import TreeNSearch

    eng = TreeNSearch(mesh=mesh)
    eng.add_point_set(p0, r0)
    eng.add_point_set(p1, r1)
    eng.set_active_search(0, 0, True)
    eng.set_active_search(0, 1, True)
    eng.set_active_search(1, 0, True)
    eng.set_cell_size(0.15)
    eng.set_use_pallas(True, interpret=True)
    eng.set_window_cap(64)
    # small fat tier: the interpreter executes every fat grid step in
    # Python, so the default fat_cap=1024 would cost minutes per call
    eng._fat_cap = 8
    eng._fat_wcap = 512
    return eng


def test_engine_distribute_matches_single_device():
    """Engine-level multi-chip (VERDICT r3 item 3): one TreeNSearch object
    with a mesh runs the sharded fast engine and SETTLES its caps —
    including route_slack — through the same regrow loop as single-chip.
    Exact parity with the single-device engine on the 8-CPU mesh."""
    mesh = _mesh()
    rng = np.random.default_rng(21)
    n0, n1 = 600, 360
    p0 = rng.uniform(0, 1, (n0, 3)).astype(np.float32)
    p1 = rng.uniform(0, 1, (n1, 3)).astype(np.float32)
    r0 = rng.uniform(0.09, 0.15, n0).astype(np.float32)
    r1 = rng.uniform(0.09, 0.15, n1).astype(np.float32)

    eng1 = _build_engine(p0, r0, p1, r1)
    eng1.run()

    eng8 = _build_engine(p0, r0, p1, r1, mesh=mesh)
    assert eng8.get_mesh() is mesh
    # deliberately undersized routing buckets: the settle loop must
    # detect route_overflow and grow route_slack until the run is clean.
    # 0.2 -> S=16 < the measured max bucket load for this seed, so
    # exactly one doubling settles it (each distinct S is a fresh XLA
    # compile; starting lower costs minutes of suite time for no extra
    # coverage)
    eng8._route_slack = 0.2
    eng8.run()
    assert eng8._route_slack > 0.2

    for (si, sj) in ((0, 0), (0, 1), (1, 0)):
        c1, nb1 = eng1.get_neighbors(si, sj)
        c2, nb2 = eng8.get_neighbors(si, sj)
        c1, nb1 = np.asarray(c1), np.asarray(nb1)
        c2, nb2 = np.asarray(c2), np.asarray(nb2)
        assert np.array_equal(c1, c2), (si, sj)
        for i in range(c1.shape[0]):
            assert np.array_equal(np.sort(nb1[i][: c1[i]]),
                                  np.sort(nb2[i][: c2[i]])), (si, sj, i)

    # the engine object stays fully usable: switch back to single-device
    eng8.distribute(None)
    eng8.run()
    c3, _ = eng8.get_neighbors(0, 0)
    assert np.array_equal(np.asarray(c3), np.asarray(eng1.get_neighbors(0, 0)[0]))


def test_engine_distribute_pipeline_fallback():
    """With the Pallas gate closed (use_pallas off) the distributed engine
    serves run() through the sharded reference pipeline — same results."""
    mesh = _mesh()
    rng = np.random.default_rng(23)
    n = 640
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    from treensearch_tpu import TreeNSearch

    eng1 = TreeNSearch()
    eng1.add_point_set(pts)
    eng1.set_search_radius(0.1)
    eng1.set_all_searches(True)
    eng1.set_use_pallas(False)
    eng1.run()

    eng8 = TreeNSearch(mesh=mesh)
    eng8.add_point_set(pts)
    eng8.set_search_radius(0.1)
    eng8.set_all_searches(True)
    eng8.set_use_pallas(False)
    eng8.run()

    c1, nb1 = map(np.asarray, eng1.get_neighbors(0, 0))
    c2, nb2 = map(np.asarray, eng8.get_neighbors(0, 0))
    assert np.array_equal(c1, c2)
    for i in range(n):
        assert np.array_equal(np.sort(nb1[i][: c1[i]]),
                              np.sort(nb2[i][: c2[i]])), i
