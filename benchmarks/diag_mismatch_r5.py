"""Bisect the validate_1m_r5 per-point count mismatch (1882 points,
totals exact) across knob configurations on hardware.

For each config: run the engine at 1M / cell=1.0r, compare per-point
counts to the native C++ grid oracle, and classify mismatching points by
tile (narrow vs fat tier) through the carried layout maps.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from treensearch_tpu import TreeNSearch
from treensearch_tpu.native_oracle import grid_search_pair

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


rng = np.random.default_rng(0)
pts0 = rng.uniform(0, 1, (N, 3)).astype(np.float32)

# one zsort (as bench.py/validate do)
eng0 = TreeNSearch()
eng0.add_point_set(pts0)
eng0.prepare_zsort()
pts = np.asarray(eng0.apply_zsort(0, pts0))
del eng0

stamp("native oracle")
oc, _offs, _onbr = grid_search_pair(pts, pts, R, same_set=True)
oc = np.asarray(oc)
stamp(f"oracle total {oc.sum()}")


def case(name, cellf=1.0, **kn):
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(R)
    eng.set_all_searches(True)
    eng.set_cell_size(cellf * R)
    if "pack" in kn:
        eng.set_record_pack(kn["pack"])
    if "wcap" in kn:
        eng.set_window_cap(kn["wcap"])
    if "lane_batch" in kn:
        eng.set_lane_batch(kn["lane_batch"])
    if "tps" in kn:
        eng.set_tiles_per_step(kn["tps"])
    eng.run()
    ec1 = np.asarray(eng.get_counts(0, 0))
    bad1 = np.nonzero(ec1 != oc)[0]
    eng.run()   # carry-reuse path (points unchanged)
    ec = np.asarray(eng.get_counts(0, 0))
    bad = np.nonzero(ec != oc)[0]
    msg = (f"{name}: mismatch run1(rebuild)={bad1.size} "
           f"run2(reuse)={bad.size} "
           f"(pack={eng._pack} wcap={eng._wcap} lb={eng._lane_batch})")
    if bad.size:
        # classify by tile through the carried maps
        carry = eng._fast_carry
        if carry is not None:
            qpos = np.asarray(carry.qpos)
            fat_slot = np.asarray(carry.fat_slot)
            tiles = qpos[bad] // 128
            fat = fat_slot[tiles] >= 0
            ut, cnts = np.unique(tiles, return_counts=True)
            msg += (f" tiles={ut.size} fat_pts={int(fat.sum())} "
                    f"narrow_pts={int((~fat).sum())}")
            msg += f" first_tiles={[(int(t), int(c)) for t, c in zip(ut[:6], cnts[:6])]}"
            d = (ec[bad] - oc[bad])
            msg += f" delta_hist={np.unique(d, return_counts=True)}"
    stamp(msg)
    del eng


case("H lane_batch pack16 wcap256 (headline)",
     pack=16, wcap=256, lane_batch=True)
case("A per-window pack16 wcap256", pack=16, wcap=256, lane_batch=False)
case("B lane_batch pack4 wcap192", pack=4, wcap=192, lane_batch=True)
case("C per-window pack4 wcap192 (r3 headline)",
     pack=4, wcap=192, lane_batch=False)
case("D default cell 1.5r auto", cellf=1.5)
