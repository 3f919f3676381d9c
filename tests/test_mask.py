"""Tile-layout bitmask contract (`run_mask` / fastpath mask_output).

The zero-compaction output: the pairs kernel bit-packs the per-pair
masks over the record phases and stores them in tile layout — no
staging, no merge, no output caps.  `ops.fastpath.decode_mask` is the
host reference decoder; its output must equal the numpy O(n^2) oracle's
EXACT neighbor sets (the same pairs `run()` emits).
"""

import numpy as np
import pytest

from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops.fastpath import decode_mask

RNG = np.random.default_rng(20260821)


def _oracle_sets(all_pts, sid, active, R=None, radii=None,
                 symmetric=False):
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
    return m


def _check(mask, meta, m_oracle, sid):
    counts, nbrs = decode_mask(mask, meta)
    exp_cnt = m_oracle.sum(1)
    offs = np.asarray(meta["set_offsets"])
    for gi in range(m_oracle.shape[0]):
        exp = np.nonzero(m_oracle[gi])[0]
        got = nbrs.get(gi, np.zeros((0,), np.int64))
        assert np.array_equal(got, exp), f"query {gi}"
    # device-side counts agree with the oracle in original order
    for si in range(len(meta["set_sizes"])):
        n_i = meta["set_sizes"][si]
        got_c = np.asarray(mask["counts"][f"s{si}"])
        sl = slice(offs[si], offs[si] + n_i)
        assert np.array_equal(got_c, exp_cnt[sl]), f"set {si} counts"


@pytest.mark.parametrize("pack", [1, 8])
def test_mask_multiset_active_matrix(pack):
    """3 sets, asymmetric active matrix; pack=8 exercises the sorted-
    window (rec_expand) candidate space, pack=1 the padded layout."""
    a = RNG.uniform(0, 1, (500, 3)).astype(np.float32)
    b = RNG.uniform(0, 1, (300, 3)).astype(np.float32)
    c = RNG.uniform(0, 1, (200, 3)).astype(np.float32)
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
    mask, meta = ns.run_mask()
    allp = np.concatenate([a, b, c])
    sid = np.repeat(np.arange(3), [len(a), len(b), len(c)])
    m = _oracle_sets(allp, sid, active, R=0.09)
    _check(mask, meta, m, sid)


def test_mask_variable_symmetric():
    n = 600
    pts = RNG.uniform(0, 1, (n, 3)).astype(np.float32)
    radii = RNG.uniform(0.04, 0.12, n).astype(np.float32)
    ns = TreeNSearch()
    ns.add_point_set(pts, radii)
    ns.set_all_searches(True)
    ns.set_symmetric_search(True)
    ns.set_use_pallas(True, interpret=True)
    mask, meta = ns.run_mask()
    m = _oracle_sets(pts, np.zeros(n, int), [(0, 0)],
                     radii=radii, symmetric=True)
    _check(mask, meta, m, np.zeros(n, int))


def test_mask_fat_tier():
    """Snug window cap + a point cluster inside one cell -> those tiles
    route through the fat tier, whose bits_fat block (wider rows) must
    supply their masks."""
    n = 600
    pts = RNG.uniform(0, 1, (n, 3)).astype(np.float32)
    pts[:120] = 0.5 + 0.02 * RNG.uniform(-1, 1, (120, 3))  # one cell
    pts = pts.astype(np.float32)
    ns = TreeNSearch()
    ns.add_point_set(pts)
    ns.set_search_radius(0.1)
    ns.set_all_searches(True)
    ns.set_use_pallas(True, interpret=True)
    ns.set_window_cap(32)  # snug -> clustered tiles route fat
    mask, meta = ns.run_mask()
    assert int(np.asarray(mask["fat_slot"]).max()) >= 0, \
        "test intended to exercise the fat tier"
    m = _oracle_sets(pts, np.zeros(n, int), [(0, 0)], R=0.1)
    _check(mask, meta, m, np.zeros(n, int))


def test_mask_matches_run_and_reuse():
    """run_mask answers == run()'s lists on the same engine, and a
    second run_mask after moving points stays exact (carry staleness
    detected on device)."""
    n = 500
    pts = RNG.uniform(0, 1, (n, 3)).astype(np.float32)
    ns = TreeNSearch()
    ns.add_point_set(pts)
    ns.set_search_radius(0.1)
    ns.set_all_searches(True)
    ns.set_use_pallas(True, interpret=True)
    mask, meta = ns.run_mask()
    m = _oracle_sets(pts, np.zeros(n, int), [(0, 0)], R=0.1)
    _check(mask, meta, m, np.zeros(n, int))

    pts2 = (pts + RNG.normal(0, 0.05, pts.shape)) \
        .astype(np.float32).clip(0, 1)
    ns.resize_point_set(0, pts2)
    mask2, meta2 = ns.run_mask()
    m2 = _oracle_sets(pts2, np.zeros(n, int), [(0, 0)], R=0.1)
    _check(mask2, meta2, m2, np.zeros(n, int))
