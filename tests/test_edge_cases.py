"""Edge cases targeted by the reference stress tests
(``tests/tests.cpp:287-427``): empty sets, tiny sets, coincident points,
degenerate domains, dynamic add/remove churn."""

import numpy as np
import pytest

from helpers import make_engine_and_oracle
from treensearch_tpu import TreeNSearch
from treensearch_tpu.oracle import BruteforceNSearch


@pytest.mark.parametrize("counts", [
    (0,), (1,), (2,), (7,), (16,), (17,),
    # pallas tile (=128) boundary cases
    (127,), (128,), (129,),
    # 2-tile / row-padding boundaries (255/256/257 straddle two tiles)
    (255,), (256,), (257,), (128, 128),
    (0, 0), (0, 5), (5, 0), (1, 1), (9, 16), (100, 3), (128, 1),
    (127, 2), (31, 97),
    (0, 1, 100), (4, 0, 9), (126, 1, 2),
])
def test_combinatorial_small_sets(counts):
    # reference combinatorial_stress_test (tests.cpp:287-427), reduced grid
    rng = np.random.default_rng(sum(counts) + len(counts))
    sets = [(rng.uniform(0, 1, (c, 3)).astype(np.float32), None)
            for c in counts]
    eng, orc = make_engine_and_oracle(sets, search_radius=0.3)
    eng.run()
    orc.run()
    orc.compare(eng)
    # zsort round trip on every set (reference does this per case)
    eng.prepare_zsort()
    for k, (pts, _) in enumerate(sets):
        p2 = eng.apply_zsort(k, np.array(pts))
        assert p2.shape == pts.shape


def test_single_point():
    eng = TreeNSearch()
    eng.add_point_set(np.zeros((1, 3), np.float32))
    eng.set_search_radius(1.0)
    eng.set_all_searches(True)
    eng.run()
    assert eng.get_neighborlist(0, 0, 0).size() == 0


def test_coincident_points_are_mutual_neighbors_but_not_self():
    # reference self-exclusion is by index (TreeNSearch.cpp:2068-2069)
    pts = np.zeros((4, 3), np.float32)
    eng, orc = make_engine_and_oracle([(pts, None)], search_radius=0.1)
    eng.run()
    orc.run()
    orc.compare(eng)
    assert sorted(eng.get_neighborlist(0, 0, 2)) == [0, 1, 3]


def test_all_points_in_one_cell():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1e-4, (50, 3)).astype(np.float32)
    eng, orc = make_engine_and_oracle([(pts, None)], search_radius=0.5)
    eng.run()
    orc.run()
    orc.compare(eng)


def test_no_active_searches_is_legal():
    eng = TreeNSearch()
    eng.add_point_set(np.random.default_rng(1).uniform(0, 1, (10, 3))
                      .astype(np.float32))
    eng.set_search_radius(0.2)
    eng.run()  # nothing active: must not crash (reference default)
    with pytest.raises(KeyError):
        eng.get_neighborlist(0, 0, 0)


def test_dynamic_emitter_churn():
    # dynamic_emitter_stress_test analog (tests.cpp:434-514): random
    # add/remove/replace of points in 2 sets, oracle-compared each step.
    # Sizes CYCLE through a fixed schedule so XLA shape compiles are
    # reused across iterations (the reference's 10000 free-shape C++
    # iterations would be 10000 recompiles here); 200 iterations cover
    # each (n0, n1) shape pair many times with fresh random data — every
    # one compared exactly against the O(n^2) oracle.
    rng = np.random.default_rng(11)
    sizes0 = (40, 45, 39, 45, 40, 1, 40, 128)
    sizes1 = (30, 30, 7, 30, 30, 30, 0, 30)
    eng = TreeNSearch()
    eng.add_point_set(np.zeros((sizes0[0], 3), np.float32))
    eng.add_point_set(np.zeros((sizes1[0], 3), np.float32))
    eng.set_search_radius(0.25)
    eng.set_all_searches(True)
    for it in range(200):
        p0 = rng.uniform(0, 1, (sizes0[it % 8], 3)).astype(np.float32)
        p1 = rng.uniform(0, 1, (sizes1[(it // 2) % 8], 3)).astype(
            np.float32)
        eng.resize_point_set(0, p0)
        eng.resize_point_set(1, p1)
        eng.run()
        orc = BruteforceNSearch(search_radius=0.25)
        orc.add_point_set(p0)
        orc.add_point_set(p1)
        orc.set_all_searches(True)
        orc.run()
        orc.compare(eng)


def test_moving_points_reuse_state_hysteresis():
    # temporal coherence: points jiggle in place across steps; grid state
    # must stay valid and results stay exact (reference cpp:474-487)
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.12)
    eng.set_all_searches(True)
    for _ in range(4):
        pts = (pts + rng.uniform(-0.005, 0.005, pts.shape)
               .astype(np.float32)).astype(np.float32)
        eng.resize_point_set(0, pts)
        eng.run()
        orc = BruteforceNSearch(search_radius=0.12)
        orc.add_point_set(pts)
        orc.set_all_searches(True)
        orc.run()
        orc.compare(eng)


def test_domain_overflow_raises():
    pts = np.array([[0, 0, 0], [1e6, 1e6, 1e6]], np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(1.0)
    eng.set_cell_size(1.0)  # forces > 2**15 cells per axis
    eng.set_all_searches(True)
    with pytest.raises(RuntimeError, match="cells per"):
        eng.run()


def test_resize_same_buffer_is_noop():
    # reference pointer-equality early-out (TreeNSearch.cpp:77-79): a
    # resize with the same buffer and size must not invalidate anything
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.2)
    eng.set_all_searches(True)
    eng.run()
    sol = eng._solution
    eng.resize_point_set(0, pts)
    assert eng._solution is sol
    eng.resize_point_set(0, pts.copy())   # new buffer -> invalidates
    assert eng._solution is None
