"""The r4 prep redesign (benchmarks/probe_r5d.out) replaced three 1M-scale
scatters with arithmetic + one key sort; these tests pin the new
constructions to the scatter semantics they replaced bit-for-bit."""
import numpy as np
import jax.numpy as jnp

import treensearch_tpu.ops.fastpath as fp
from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.grid import fresh_state


import functools


@functools.lru_cache(maxsize=None)
def _prep(variable, seed=3, n=4000, cell=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    rad = rng.uniform(0.04, 0.06, n).astype(np.float32) if variable else None
    cfg = SearchConfig((n,), ((0, 0),), variable, variable, 1,
                       1024, 512, 96)
    knobs = fp.FastKnobs(wcap=192, dense_cap=1 << 14, use_pallas=False,
                         tiles_cap=600)
    rj = jnp.asarray(rad) if variable else None
    _, state = fp.build_and_search_fast(
        jnp.asarray(pts), rj, jnp.float32(cell), jnp.float32(cell),
        fresh_state(), cfg, knobs)
    carry = fp._pallas_prep(jnp.asarray(pts), rj, state, cfg,
                            knobs._replace(use_pallas=True))
    assert int(carry.tile_overflow) == 0
    return carry, n


def test_opad_matches_scatter_semantics():
    for variable in (False, True):
        carry, n = _prep(variable)
        opad = np.asarray(carry.opad)
        ref = np.full(opad.shape, n, np.int32)
        ref[np.asarray(carry.pp)] = np.asarray(carry.idx_s)
        assert np.array_equal(opad, ref)


def test_inv_perm_qpos_match_scatter_semantics():
    for variable in (False, True):
        carry, n = _prep(variable)
        idx_s = np.asarray(carry.idx_s)
        inv_ref = np.zeros(n, np.int32)
        inv_ref[idx_s] = np.arange(n, dtype=np.int32)
        q_ref = np.zeros(n, np.int32)
        q_ref[idx_s] = np.asarray(carry.pp)
        assert np.array_equal(np.asarray(carry.inv_perm), inv_ref)
        assert np.array_equal(np.asarray(carry.qpos), q_ref)


@functools.lru_cache(maxsize=None)
def _prep_brick(variable, brick=(2, 2, 3), seed=3, n=4000, cell=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    rad = rng.uniform(0.04, 0.06, n).astype(np.float32) if variable else None
    cfg = SearchConfig((n,), ((0, 0),), variable, variable, 1,
                       1024, 512, 96)
    knobs = fp.FastKnobs(wcap=64, dense_cap=1 << 14, use_pallas=False,
                         tiles_cap=1400, pack=8, brick=brick)
    rj = jnp.asarray(rad) if variable else None
    _, state = fp.build_and_search_fast(
        jnp.asarray(pts), rj, jnp.float32(cell), jnp.float32(cell),
        fresh_state(), cfg, knobs)
    carry = fp._pallas_prep(jnp.asarray(pts), rj, state, cfg,
                            knobs._replace(use_pallas=True))
    assert int(carry.tile_overflow) == 0
    assert int(carry.rows_overflow) == 0
    return carry, n, cfg, knobs._replace(use_pallas=True), pts


def test_brick_query_layout_invariants():
    """Brick layout: opad/qpos are inverse maps over a brick-major
    padded order; every point appears exactly once."""
    for variable in (False, True):
        carry, n, _, _, _ = _prep_brick(variable)
        opad = np.asarray(carry.opad)
        qpos = np.asarray(carry.qpos)
        real = opad[opad < n]
        assert len(real) == n and len(np.unique(real)) == n
        # qpos is opad's inverse on real slots
        assert np.array_equal(opad[qpos], np.arange(n, dtype=np.int32))
        # pp maps brick-seq positions to padded slots, monotone
        pp = np.asarray(carry.pp)
        assert np.all(np.diff(pp) > 0)


def test_brick_windows_disjoint_and_cover():
    """Per tile: windows are disjoint sorted ranges that cover every
    in-reach cell of the tile's queries (fixed radius, w=1)."""
    from treensearch_tpu.ops.pallas_pairs import LENS_OFF

    carry, n, cfg, knobs, pts = _prep_brick(False)
    st = fp._pallas_statics(cfg, knobs)
    desc = np.asarray(carry.desc)
    lin_s = np.asarray(carry.lin_s)
    opad = np.asarray(carry.opad)
    n_win = len(st["offs_2d"])
    tiles = st["tiles_cap"]
    covered = [set() for _ in range(tiles)]
    for t in range(tiles):
        spans = []
        for wi in range(n_win):
            s = desc[t, wi]
            ln = desc[t, LENS_OFF + wi]
            if ln > 0:
                spans.append((s, s + ln))
                covered[t].update(lin_s[s:s + ln].tolist())
        spans.sort()
        for a, b in zip(spans, spans[1:]):
            assert a[1] <= b[0], (t, a, b)  # disjoint
    # every query's own cell is covered by its tile's windows (the
    # center windows include the query's cell by construction)
    lin_by_orig = np.zeros(n, np.int64)
    lin_by_orig[np.asarray(carry.idx_s)] = lin_s
    for t in range(tiles):
        for lane in range(128):
            o = opad[t * 128 + lane]
            if o < n:
                assert lin_by_orig[o] in covered[t], (t, lane, o)


def test_cell_table_sort_build_matches_histogram_build():
    """The sort-compacted dense-table build (n > dense_cap production
    regime) is bit-identical to the histogram+cumsum build, including
    empty cells, runs at the table edges, and the table[dense_cap] = n
    terminator."""
    import jax.numpy as jnp
    from treensearch_tpu.ops.fastpath import _cell_table

    rng = np.random.default_rng(3)
    for trial, (n, dense_cap) in enumerate(
            [(500, 120), (1000, 64), (130, 128), (257, 8), (2, 1)]):
        lin = np.sort(rng.integers(0, dense_cap, n)).astype(np.int32)
        iota = jnp.arange(n, dtype=jnp.int32)
        t_hist = np.asarray(_cell_table(jnp.asarray(lin), iota, n,
                                        dense_cap, False))
        t_sort = np.asarray(_cell_table(jnp.asarray(lin), iota, n,
                                        dense_cap, True))
        # independent numpy reference: #points with lin < q
        want = np.searchsorted(lin, np.arange(dense_cap + 1), side="left")
        assert np.array_equal(t_hist, want), trial
        assert np.array_equal(t_sort, want), trial
