"""Fused neighbor-reduce (`run_reduce` / `make_step_fn(reduce=...)`).

The device visitor: the pairs kernel evaluates a user-traced callback
over every neighbor pair the active searches would emit and sums its
outputs per query — no neighbor list is materialized (TPU-native role
of the reference visitor ``for_each_neighbor``, ``TreeNSearch.h:221-258``
and ``TreeNSearch.cpp:2571-2596``).

Oracle: independent numpy O(n^2) reductions.  Counts (an ``ones``
reduce) must be EXACT (integer-valued f32 sums); value reductions are
compared at f32-accumulation tolerance (the kernel sums in a different
order than numpy).
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from treensearch_tpu import TreeNSearch

RNG = np.random.default_rng(20260820)


def _mask(all_pts, sid, active, R=None, radii=None, symmetric=False):
    d = all_pts[:, None, :].astype(np.float32) \
        - all_pts[None, :, :].astype(np.float32)
    d2 = (d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]) \
        + d[..., 2] * d[..., 2]
    if radii is None:
        m = d2 <= np.float32(R * R)
    else:
        r = np.asarray(radii, np.float32)
        m = d2 <= r[:, None] ** 2
        if symmetric:
            m |= d2 <= r[None, :] ** 2
    am = np.zeros((sid.max() + 1, sid.max() + 1), bool)
    for (i, j) in active:
        am[i, j] = True
    m &= am[sid[:, None], sid[None, :]]
    np.fill_diagonal(m, False)
    return m, d2


def _fn3(env):
    return (jnp.ones_like(env["d2"]), env["d2"], env["p0_j"])


def _check3(got, mask, d2, vals, sl):
    cnt = mask.sum(1).astype(np.float32)[sl]
    sd2 = np.where(mask, d2, 0).sum(1, dtype=np.float64)[sl]
    sv = np.where(mask, vals[None, :], 0).sum(1, dtype=np.float64)[sl]
    assert np.array_equal(got[:, 0], cnt)
    assert np.allclose(got[:, 1], sd2, rtol=3e-5, atol=1e-6)
    assert np.allclose(got[:, 2], sv, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("pack", [1, 8])
def test_reduce_multiset_active_matrix(pack):
    """3 sets, asymmetric active matrix, payload; pack=8 exercises the
    rec_expand record build (payload rides the sort)."""
    a = RNG.uniform(0, 1, (500, 3)).astype(np.float32)
    b = RNG.uniform(0, 1, (300, 3)).astype(np.float32)
    c = RNG.uniform(0, 1, (200, 3)).astype(np.float32)
    masses = [RNG.uniform(0.5, 1.5, len(x)).astype(np.float32)
              for x in (a, b, c)]
    active = [(0, 0), (0, 2), (1, 0)]
    ns = TreeNSearch()
    for x in (a, b, c):
        ns.add_point_set(x)
    ns.set_search_radius(0.09)
    for (i, j) in active:
        ns.set_active_search(i, j, True)
    ns.set_use_pallas(True, interpret=True)
    if pack != 1:
        ns.set_record_pack(pack)
    got = ns.run_reduce(_fn3, 3, payload=masses)
    allp = np.concatenate([a, b, c])
    sid = np.repeat(np.arange(3), [len(a), len(b), len(c)])
    mask, d2 = _mask(allp, sid, active, R=0.09)
    vals = np.concatenate(masses)
    offs = np.cumsum([0, len(a), len(b), len(c)])
    for i in range(3):
        _check3(got[i], mask, d2, vals, slice(offs[i], offs[i + 1]))


def test_reduce_variable_symmetric():
    n = 600
    pts = RNG.uniform(0, 1, (n, 3)).astype(np.float32)
    radii = RNG.uniform(0.04, 0.12, n).astype(np.float32)
    ns = TreeNSearch()
    ns.add_point_set(pts, radii)
    ns.set_all_searches(True)
    ns.set_symmetric_search(True)
    ns.set_use_pallas(True, interpret=True)
    got = ns.run_reduce(
        lambda env: (jnp.ones_like(env["d2"]), env["d2"] * env["r_j"]),
        2)[0]
    mask, d2 = _mask(pts, np.zeros(n, int), [(0, 0)],
                     radii=radii, symmetric=True)
    assert np.array_equal(got[:, 0], mask.sum(1).astype(np.float32))
    exp = np.where(mask, d2 * radii[None, :], 0).sum(1, dtype=np.float64)
    assert np.allclose(got[:, 1], exp, rtol=3e-5, atol=1e-7)


def test_reduce_fat_tier_and_step_fn():
    """Snug wcap forces fat-tier routing; then the reduce step fn with
    carry reuse, moved points, and a payload step operand."""
    n = 600
    pts = RNG.uniform(0, 1, (n, 3)).astype(np.float32)
    mass = RNG.uniform(0.5, 1.5, n).astype(np.float32)
    mask, _ = _mask(pts, np.zeros(n, int), [(0, 0)], R=0.1)

    ns = TreeNSearch()
    ns.add_point_set(pts)
    ns.set_search_radius(0.1)
    ns.set_all_searches(True)
    ns.set_use_pallas(True, interpret=True)
    ns.set_window_cap(32)  # snug -> tiles route to the fat tier
    got = ns.run_reduce(lambda env: jnp.ones_like(env["d2"]), 1)[0]
    assert np.array_equal(got[:, 0], mask.sum(1).astype(np.float32))

    ns.run_reduce(lambda env: jnp.ones_like(env["d2"]), 1)  # settle
    step, st = ns.make_step_fn(reduce=(lambda env: env["p0_j"], 1))
    pl = jnp.asarray(np.stack([mass, np.zeros_like(mass)], 1))
    sol, st = step(st, jnp.asarray(pts), payload=pl)
    g1 = np.asarray(sol["reduce"]["s0"])[0]
    exp1 = np.where(mask, mass[None, :], 0).sum(1, dtype=np.float64)
    assert np.allclose(g1, exp1, rtol=3e-5, atol=1e-6)

    pts2 = (pts + RNG.normal(0, 0.03, pts.shape)) \
        .astype(np.float32).clip(0, 1)
    sol2, st = step(st, jnp.asarray(pts2), payload=pl)
    g2 = np.asarray(sol2["reduce"]["s0"])[0]
    mask2, _ = _mask(pts2, np.zeros(n, int), [(0, 0)], R=0.1)
    exp2 = np.where(mask2, mass[None, :], 0).sum(1, dtype=np.float64)
    assert int(sol2["rebuilt"]) == 1  # points moved cells
    assert np.allclose(g2, exp2, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("with_payload", [False, True])
def test_reduce_sharded_matches_oracle(with_payload):
    """Sharded fused reduce on the 8-device CPU mesh: slab-local kernels
    fold the visitor over owned queries with the GLOBAL active-matrix
    mask (data-driven set ids); accumulators route home by all_to_all.
    With payload: the per-point columns ride the routed record rows, so
    halo-slab candidates must see correct p0_j too (the oracle sums over
    ALL neighbors, owned and halo alike)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from treensearch_tpu.config import SearchConfig
    from treensearch_tpu.ops.fastpath import FastKnobs, ReduceSpec
    from treensearch_tpu.parallel.sharded import (
        build_and_search_sharded_reduce_jit)
    from treensearch_tpu.ops.grid import fresh_state

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 devices")
    mesh = Mesh(np.array(devs[:8]), ("d",))
    n0, n1 = 600, 360
    pts = RNG.uniform(0, 1, (n0 + n1, 3)).astype(np.float32)
    active = ((0, 0), (0, 1), (1, 0))
    cfg = SearchConfig(
        set_sizes=(n0, n1), active_pairs=active,
        variable=False, symmetric=False,
        stencil_w=1, chunk=64, cand_cap=512, nbr_cap=96)
    knobs = FastKnobs(wcap=64, dense_cap=1 << 13, use_pallas=True,
                      pre_cap=48, pre_edge=48, interpret=True,
                      fat_cap=8, tiles_cap=96, pack=8, lane_batch=True,
                      rec_expand=True)
    sharded = jax.device_put(jnp.asarray(pts),
                             NamedSharding(mesh, P("d")))
    if with_payload:
        mass = RNG.uniform(0.5, 1.5, n0 + n1).astype(np.float32)
        pl = jnp.asarray(np.stack([mass, np.zeros_like(mass)], 1))
        pl = jax.device_put(pl, NamedSharding(mesh, P("d")))
        rs = ReduceSpec(
            lambda env: (jnp.ones_like(env["d2"]), env["d2"],
                         env["p0_j"]), 3, True)
    else:
        mass, pl = None, None
        rs = ReduceSpec(
            lambda env: (jnp.ones_like(env["d2"]), env["d2"]), 2)
    sol, _ = build_and_search_sharded_reduce_jit(
        sharded, None, jnp.float32(0.1), jnp.float32(0.15),
        fresh_state(), cfg, mesh, knobs, rs, payload=pl)
    for flag in ("route_overflow", "tile_overflow", "rows_overflow",
                 "dense_overflow"):
        assert int(sol[flag]) == 0, flag
    assert int(sol["cand_max"]) == 0

    sid = np.repeat(np.arange(2), [n0, n1])
    mask, d2 = _mask(pts, sid, active, R=0.1)
    cnt = mask.sum(1).astype(np.float32)
    sd2 = np.where(mask, d2, 0).sum(1, dtype=np.float64)
    offs = [0, n0, n0 + n1]
    for si in range(2):
        got = np.asarray(sol["reduce"][f"s{si}"])
        sl = slice(offs[si], offs[si + 1])
        assert np.array_equal(got[0], cnt[sl]), f"set {si} counts"
        assert np.allclose(got[1], sd2[sl], rtol=3e-5, atol=1e-6)
        if with_payload:
            sm = np.where(mask, mass[None, :], 0).sum(1, dtype=np.float64)
            assert np.allclose(got[2], sm[sl], rtol=3e-5, atol=1e-6)
