"""Native CPU grid oracle: validate against the numpy brute force, then use
it to validate the engine at a size the O(n^2) oracle can't reach."""

import numpy as np
import pytest

from treensearch_tpu import TreeNSearch
from treensearch_tpu import native_oracle as no
from treensearch_tpu.oracle import BruteforceNSearch

pytestmark = pytest.mark.skipif(not no.available(),
                                reason="no native toolchain")


def test_native_matches_bruteforce_fixed():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (800, 3)).astype(np.float32)
    counts, offs, nbrs = no.grid_search_pair(pts, pts, radius=0.1,
                                             same_set=True)
    orc = BruteforceNSearch(search_radius=0.1)
    orc.add_point_set(pts)
    orc.set_all_searches(True)
    orc.run()
    for i in range(pts.shape[0]):
        got = np.sort(nbrs[offs[i]:offs[i + 1]])
        assert np.array_equal(got, orc.neighbors[(0, 0)][i]), i


def test_native_matches_bruteforce_variable_symmetric():
    rng = np.random.default_rng(1)
    pi = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    pj = rng.uniform(0, 1, (400, 3)).astype(np.float32)
    ri = rng.uniform(0.05, 0.2, 300).astype(np.float32)
    rj = rng.uniform(0.05, 0.2, 400).astype(np.float32)
    counts, offs, nbrs = no.grid_search_pair(
        pi, pj, radii_i=ri, radii_j=rj, symmetric=True)
    orc = BruteforceNSearch(symmetric=True)
    orc.add_point_set(pi, ri)
    orc.add_point_set(pj, rj)
    orc.set_active_search(0, 1, True)
    orc.run()
    for i in range(300):
        got = np.sort(nbrs[offs[i]:offs[i + 1]])
        assert np.array_equal(got, orc.neighbors[(0, 1)][i]), i


def test_engine_parity_at_50k_points():
    # large-N parity: numpy brute force would need 2.5e9 pairs; the native
    # grid oracle handles it instantly
    rng = np.random.default_rng(2)
    n = 50_000
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    r = 0.05
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(r)
    eng.set_all_searches(True)
    eng.run()
    counts, offs, nbrs = no.grid_search_pair(pts, pts, radius=r,
                                             same_set=True)
    ec, en = eng.get_neighbors(0, 0)
    ec, en = np.asarray(ec), np.asarray(en)
    assert np.array_equal(ec, counts)
    for i in range(0, n, 97):  # sampled exact set equality
        got = np.sort(en[i][: ec[i]])
        want = np.sort(nbrs[offs[i]:offs[i + 1]])
        assert np.array_equal(got, want), i
