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


def test_apply_zsort_wide_dtypes_bit_exact():
    """Reference ``apply_zsort<T>`` is exact for ANY element type
    (``TreeNSearch.h:443-481``).  Values are chosen so an f32/i32
    round-trip would corrupt them: int64 >= 2^31 and f64 needing more
    than 24 mantissa bits."""
    n = 400
    pts = _cloud(n, 4)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.1)
    eng.prepare_zsort()
    order = eng.get_zsort_order(0)

    # int64 with high bits set (an i32 cast destroys these)
    big_i64 = (np.arange(n, dtype=np.int64) + 1) * (1 << 33) + 7
    ref_i64 = big_i64[order].copy()
    out = eng.apply_zsort(0, big_i64)
    assert out is big_i64 and out.dtype == np.int64
    assert np.array_equal(big_i64, ref_i64)

    # float64 needing > 24 mantissa bits (an f32 round-trip alters these)
    f64 = np.arange(n, dtype=np.float64) + 1.0 + 2.0 ** -40
    assert not np.array_equal(f64.astype(np.float32).astype(np.float64),
                              f64)
    ref_f64 = f64[order].copy()
    eng.apply_zsort(0, f64)
    assert f64.dtype == np.float64 and np.array_equal(f64, ref_f64)

    # strided flat f64 (reference stride semantics)
    flat = (np.arange(3 * n, dtype=np.float64) + 2.0 ** -40).ravel()
    ref_flat = flat.reshape(n, 3)[order].ravel().copy()
    eng.apply_zsort(0, flat, stride=3)
    assert np.array_equal(flat, ref_flat)

    # uint64 through the batch path, mixed with a device-path f32 array
    u64 = (np.arange(n, dtype=np.uint64) + 1) * np.uint64(1 << 40)
    f32 = np.arange(n, dtype=np.float32)
    ref_u64, ref_f32 = u64[order].copy(), f32[order].copy()
    eng.apply_zsort_batch(0, [u64, f32])
    assert np.array_equal(u64, ref_u64) and u64.dtype == np.uint64
    assert np.array_equal(f32, ref_f32)


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


def test_zsort_cell_granular_fast_path_after_run():
    """After a fast-path run, prepare_zsort reuses the carried cell
    assignment (reference cells fast path, TreeNSearch.cpp:2598-2657):
    cells in Morton order, intra-cell original order preserved, no
    re-quantization.  Independently recomputed in numpy from the carry."""
    n = 1200
    pts = _cloud(n, 5)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.1)
    eng.set_all_searches(True)
    eng.set_use_pallas(True, interpret=True)
    eng.set_window_cap(64)
    eng._fat_cap = 8
    eng.run()
    assert eng._last_stats.get("path") == "fast"
    assert eng._fast_carry is not None and bool(eng._fast_carry.valid)
    eng.prepare_zsort()
    order = eng.get_zsort_order(0)
    assert sorted(order.tolist()) == list(range(n))

    # expected: stable argsort by Morton key of the decoded padded cell
    # coords (pure-python interleave; n is small)
    lin = np.asarray(eng._fast_carry.lin_chk)
    w = int(eng._last_stats["stencil_w"])
    nc = np.asarray(eng._grid_state.n_cells)
    dy, dz = int(nc[1]) + 2 * w, int(nc[2]) + 2 * w
    k = lin % dz
    j = (lin // dz) % dy
    i = lin // (dz * dy)

    def interleave3(a, b, c):
        out = 0
        for bit in range(17):
            out |= (((int(a) >> bit) & 1) << (3 * bit + 2)
                    | ((int(b) >> bit) & 1) << (3 * bit + 1)
                    | ((int(c) >> bit) & 1) << (3 * bit))
        return out

    keys = np.array([interleave3(k[p], j[p], i[p]) for p in range(n)],
                    dtype=np.int64)
    expect = np.argsort(keys, kind="stable")
    assert np.array_equal(order, expect)

    # intra-cell original order is preserved (cell granularity)
    lin_sorted = lin[order]
    same_cell = lin_sorted[1:] == lin_sorted[:-1]
    assert np.all(order[1:][same_cell] > order[:-1][same_cell])

    # locality: z-ordered points have smaller mean step distance
    p2 = pts[order]
    d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    d_sorted = np.linalg.norm(np.diff(p2, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def test_zsort_cell_path_matches_apply_roundtrip():
    # apply_zsort through the cell-granular order keeps exactness
    n = 400
    pts = _cloud(n, 6)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(0.12)
    eng.set_all_searches(True)
    eng.set_use_pallas(True, interpret=True)
    eng.set_window_cap(64)
    eng._fat_cap = 8
    eng.run()
    eng.prepare_zsort()
    order = eng.get_zsort_order(0)
    p = pts.copy()
    eng.apply_zsort(0, p)
    assert np.array_equal(p, pts[order])
