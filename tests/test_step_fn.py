"""make_step_fn: the zero-host-sync embedding used by simulation loops
(and by bench.py / __graft_entry__)."""

import jax
import jax.numpy as jnp
import numpy as np

from treensearch_tpu import TreeNSearch
from treensearch_tpu.oracle import BruteforceNSearch


def test_step_fn_in_scan_matches_run():
    rng = np.random.default_rng(0)
    n = 1500
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.09)
    eng.set_all_searches(True)
    eng.run()  # settle caps
    want_counts = np.asarray(eng.get_neighbors(0, 0)[0])

    step, state0 = eng.make_step_fn()

    @jax.jit
    def sim(points, state):
        def body(carry, _):
            points, state = carry
            sol, state = step(state, points)
            return (points, state), sol["pairs"]["0-0"]["counts"]
        (_, state), counts_hist = jax.lax.scan(
            body, (points, state), None, length=3)
        return counts_hist

    hist = np.asarray(sim(jnp.asarray(pts), state0))
    assert hist.shape == (3, n)
    for k in range(3):
        assert np.array_equal(hist[k], want_counts)


def test_step_fn_overflow_flags_visible():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.9)         # nearly all points are neighbors
    eng.set_all_searches(True)
    eng.set_neighbor_cap(16)           # deliberately too small
    step, state0 = eng.make_step_fn()
    sol, _ = step(state0, jnp.asarray(pts))
    assert int(sol["pairs"]["0-0"]["max_count"]) > 16  # caller can detect


def test_step_fn_carries_settled_fat_caps():
    """A step fn built after run() must reproduce run()'s neighbor sets on
    a dataset that needed the fat tier (VERDICT r1: make_step_fn used to
    rebuild FastKnobs from defaults, silently dropping the settled
    fat_wcap/fat_cap/pre_cap)."""
    rng = np.random.default_rng(3)
    # dense cluster + sparse background: cluster tiles overflow the narrow
    # window cap and need the fat tier.  Slab geometry (thin x/y) keeps
    # the row-aligned tile count low — each regrow re-runs the whole
    # interpreted grid (see tests/test_pallas.py).
    cluster = (np.asarray([0.18, 0.18, 0.5])
               + 0.004 * rng.standard_normal((320, 3)))
    sparse = rng.uniform(0, 1, (480, 3))
    sparse[:, :2] *= 0.36
    pts = np.concatenate([cluster, sparse]).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.06)
    eng.set_all_searches(True)
    eng.set_use_pallas(True, interpret=True)
    eng._tiles_cap = 32   # interpret executes each grid step in Python
    # deliberately tiny fat-tier caps so run() must regrow them
    eng._fat_cap = 8
    eng._fat_wcap = 64
    eng._pre_cap = 8
    eng.run()
    assert (eng._fat_cap, eng._fat_wcap, eng._pre_cap) != (8, 64, 8) or \
        eng._wcap >= 512  # the dataset must actually have stressed a cap
    want_counts = np.asarray(eng.get_neighbors(0, 0)[0])
    want_sets = [np.sort(np.asarray(eng.get_neighborlist(0, 0, i)))
                 for i in range(0, pts.shape[0], 97)]

    step, state0 = eng.make_step_fn()
    sol, _ = step(state0, jnp.asarray(pts))
    got_counts = np.asarray(sol["pairs"]["0-0"]["counts"])
    assert np.array_equal(got_counts, want_counts)
    from treensearch_tpu.ops.fastpath import attach_blocks, materialize_nbrs
    nbrs = np.asarray(materialize_nbrs(attach_blocks(sol)["pairs"]["0-0"]))
    for k, i in enumerate(range(0, pts.shape[0], 97)):
        got = np.sort(nbrs[i][nbrs[i] >= 0][: got_counts[i]])
        assert np.array_equal(got, want_sets[k])


def test_print_state_smoke(capsys):
    rng = np.random.default_rng(2)
    eng = TreeNSearch()
    eng.add_point_set(rng.uniform(0, 1, (200, 3)).astype(np.float32),
                      rng.uniform(0.05, 0.2, 200).astype(np.float32))
    eng.add_point_set(rng.uniform(0, 1, (50, 3)).astype(np.float32),
                      rng.uniform(0.05, 0.2, 50).astype(np.float32))
    eng.set_all_searches(True)
    eng.run()
    eng.print_state()
    out = capsys.readouterr().out
    assert "world box" in out and "pair (0->0)" in out
    assert "radius min/avg/max" in out and "neighborlist bytes" in out