"""Two-pass (split-staging) kernel parity: mask pass 1 + staging pass 2.

`FastKnobs.split_stage` routes the lane-batched kernel through a
mask-mode pass 1 (bit-packed pair masks in tile layout) and a pass-2
kernel that unpacks the bits and runs the staging compaction + merge.
The output contract is identical to the fused call, so the results must
be BIT-IDENTICAL (same counts arrays, same neighbor blocks) — the only
intended difference is scheduling (benchmarks/NOTES.md round 5: the
staging network costs ~25 ms/step in situ vs ~2.9 ms standalone).

Reference bar: the same hot loop both engines implement,
``/root/reference/TreeNSearch/source/TreeNSearch.cpp:2474-2493``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops import fastpath as fp
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.oracle import BruteforceNSearch


def _run(pts_np, rad_np, r, cell, cfg, knobs):
    sol, _ = fp.build_and_search_fast_jit(
        jnp.asarray(pts_np),
        jnp.asarray(rad_np) if rad_np is not None else None,
        jnp.float32(0.0 if rad_np is not None else r), jnp.float32(cell),
        fresh_state(), cfg, knobs)
    assert int(sol["pallas_used"]) == 1
    assert int(sol["tile_overflow"]) == 0
    return fp.attach_blocks(sol)


@pytest.mark.parametrize("variable,pack,rec_expand,nsets,shared", [
    # the 1M production configuration (pack 8, lane_batch, sorted-window
    # DMA records) through the two-pass kernel
    (False, 8, True, 1, False),
    # multi-set asymmetric matrix + variable symmetric radii, per-block
    # staging
    (True, 4, False, 2, False),
    # multi-set through the SHARED combined staging (the 10M x 3-set
    # production path): pass 2 keeps the packed set|orig compaction
    (False, 8, True, 2, True),
])
def test_split_stage_bit_identical_to_fused(variable, pack, rec_expand,
                                            nsets, shared):
    rng = np.random.default_rng(17)
    n, r = 900, 0.09
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts[:, :2] *= 0.42              # slab geometry (see test_pallas.py)
    rad = rng.uniform(0.8 * r, 1.2 * r, n).astype(np.float32) \
        if variable else None
    cell = 1.5 * (rad.min() if variable else r)
    w = 2 if variable else 1
    if nsets == 2:
        sizes = (n - 300, 300)
        pairs = ((0, 0), (0, 1), (1, 0))
    else:
        sizes = (n,)
        pairs = ((0, 0),)
    cfg = SearchConfig(sizes, pairs, variable, variable, w, 1024, 512, 96)
    base = dict(wcap=160 if variable else 256, dense_cap=1 << 14,
                use_pallas=True, pre_cap=96, pre_edge=96, interpret=True,
                fat_cap=8, fat_wcap=512, tiles_cap=48, pack=pack,
                lane_batch=True, rec_expand=rec_expand,
                shared_compact=shared)
    sol_f = _run(pts, rad, r, cell, cfg, fp.FastKnobs(**base))
    sol_s = _run(pts, rad, r, cell, cfg,
                 fp.FastKnobs(split_stage=True, **base))

    # bit-identical kernel outputs (counts + tile-layout neighbor blocks)
    for (si, sj) in pairs:
        pf, ps = sol_f["pairs"][f"{si}-{sj}"], sol_s["pairs"][f"{si}-{sj}"]
        assert np.array_equal(np.asarray(pf["counts"]),
                              np.asarray(ps["counts"])), (si, sj)
        nf = np.asarray(fp.materialize_nbrs(pf))
        ns_ = np.asarray(fp.materialize_nbrs(ps))
        cnt = np.asarray(pf["counts"])
        for i in range(sizes[si]):
            assert np.array_equal(nf[i][:cnt[i]], ns_[i][:cnt[i]]), \
                (si, sj, i)

    # and oracle-exact
    orc = BruteforceNSearch(search_radius=None if variable else r,
                            symmetric=variable)
    if nsets == 2:
        orc.add_point_set(pts[:sizes[0]], rad[:sizes[0]]
                          if variable else None)
        orc.add_point_set(pts[sizes[0]:], rad[sizes[0]:]
                          if variable else None)
        for (si, sj) in pairs:
            orc.set_active_search(si, sj, True)
    else:
        orc.add_point_set(pts, rad)
        orc.set_all_searches(True)
    orc.run()
    for (si, sj) in pairs:
        cnt = np.asarray(sol_s["pairs"][f"{si}-{sj}"]["counts"])
        nb = np.asarray(fp.materialize_nbrs(sol_s["pairs"][f"{si}-{sj}"]))
        for i in range(sizes[si]):
            got = np.sort(nb[i][:cnt[i]])
            assert np.array_equal(got, orc.neighbors[(si, sj)][i]), \
                (si, sj, i)


@pytest.mark.smoke
def test_trace_split_stage():
    """eval_shape guard over the split-stage production rows (see
    tests/test_smoke.py for the tier's rationale)."""
    rows = [(dict(pack=8, lane_batch=True, rec_expand=True), 1),
            (dict(pack=16, lane_batch=True, rec_expand=True, tps=1), 1),
            (dict(pack=8, lane_batch=True, brick=(2, 2, 3)), 1),
            # multi-set shared combined staging (10M x 3-set path)
            (dict(pack=8, lane_batch=True, rec_expand=True,
                  shared_compact=True), 3)]
    for kw, nsets in rows:
        sizes = tuple([208 // nsets] * (nsets - 1)
                      + [208 - (208 // nsets) * (nsets - 1)])
        pairs = tuple((i, j) for i in range(nsets) for j in range(nsets))
        cfg = SearchConfig(sizes, pairs, False, False, 1, 128, 256, 64)
        knobs = fp.FastKnobs(use_pallas=True, interpret=True, wcap=128,
                             fat_wcap=256, fat_cap=16, dense_cap=1 << 14,
                             rows_cap=1 << 10, pre_cap=32, pre_edge=16,
                             split_stage=True, **kw)
        pts = jax.ShapeDtypeStruct((cfg.n_points, 3), jnp.float32)
        jax.eval_shape(
            lambda p: fp.build_and_search_fast(
                p, None, jnp.float32(0.02), jnp.float32(0.022),
                fresh_state(), cfg, knobs),
            pts)
