"""Z-sort subsystem tests (reference ``TreeNSearch.cpp:2571-2716``,
``TreeNSearch.h:443-481``, usage pattern ``README.md:95-111``)."""

import numpy as np
import pytest

from treensearch_tpu import TreeNSearch
from treensearch_tpu.oracle import BruteforceNSearch


def _cloud(n, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, (n, 3)) \
        .astype(np.float32)


def test_zsort_is_permutation_and_improves_locality():
    pts = _cloud(2000)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.1)
    eng.prepare_zsort()
    order = eng.get_zsort_order(0)
    assert sorted(order.tolist()) == list(range(2000))
    # z-ordered points must have (much) smaller mean step distance
    p2 = pts[order]
    d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    d_sorted = np.linalg.norm(np.diff(p2, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def test_apply_zsort_strided_and_inplace():
    n = 500
    pts = _cloud(n, 1)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.1)
    eng.prepare_zsort()
    order = eng.get_zsort_order(0)

    # (n, 3) rows
    p = np.array(pts)
    out = eng.apply_zsort(0, p)
    assert out is p  # in-place for numpy
    assert np.array_equal(p, pts[order])

    # flat xyzxyz with stride 3 (reference stride semantics, h:443-481)
    flat = np.array(pts).ravel()
    eng.apply_zsort(0, flat, stride=3)
    assert np.array_equal(flat.reshape(n, 3), pts[order])

    # scalar per-point array (stride 1), e.g. densities
    dens = np.arange(n, dtype=np.float64)
    eng.apply_zsort(0, dens)
    assert np.array_equal(dens, np.arange(n)[order].astype(np.float64))


def test_zsort_then_run_parity():
    # the reference's typical flow: prepare, reorder user arrays, rerun
    pts = _cloud(1500, 2)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.09)
    eng.set_all_searches(True)
    eng.run()
    eng.prepare_zsort()
    p = np.array(pts)
    eng.apply_zsort(0, p, stride=1 if p.ndim == 2 else 3)
    eng.resize_point_set(0, p)
    eng.run()
    orc = BruteforceNSearch(search_radius=0.09)
    orc.add_point_set(p)
    orc.set_all_searches(True)
    orc.run()
    orc.compare(eng)


def test_apply_without_prepare_raises():
    eng = TreeNSearch()
    eng.add_point_set(_cloud(10))
    eng.set_search_radius(0.1)
    with pytest.raises(RuntimeError, match="prepare_zsort"):
        eng.apply_zsort(0, np.zeros((10, 3), np.float32))


def test_zsort_invalidated_by_resize():
    eng = TreeNSearch()
    eng.add_point_set(_cloud(10))
    eng.set_search_radius(0.1)
    eng.prepare_zsort()
    eng.resize_point_set(0, _cloud(12))
    with pytest.raises(RuntimeError):
        eng.apply_zsort(0, np.zeros((12, 3), np.float32))
