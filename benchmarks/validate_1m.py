"""Exact-parity validation of the full TPU engine at 1M points against the
native C++ grid oracle (the numpy O(n^2) oracle is infeasible here).

Runs the EXACT bench.py headline configuration by default (zsorted
points, cell = BENCH_CELLF * r with CELLF = 1.15, pack=8, auto-tuned wcap,
same env overrides), so the committed artifact validates the same
program the headline number is reported from (VERDICT r3 item 6)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from treensearch_tpu import TreeNSearch
from treensearch_tpu import native_oracle as no


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)

stamp("engine run (TPU), bench.py headline configuration")
eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.set_cell_size(float(os.environ.get("BENCH_CELLF", 1.15)) * R)
if "BENCH_WCAP" in os.environ:
    eng.set_window_cap(int(os.environ["BENCH_WCAP"]))
eng.set_record_pack(int(os.environ.get("BENCH_PACK", 8)))
c, e = os.environ.get("BENCH_PRE", "64,32").split(",")
eng.set_prestage_caps(int(c), int(e))
if "BENCH_TPS" in os.environ:
    eng.set_tiles_per_step(int(os.environ["BENCH_TPS"]))
if "BENCH_SPLIT" in os.environ:   # two-pass split-staging kernel
    eng.set_split_stage(bool(int(os.environ["BENCH_SPLIT"])))
eng.prepare_zsort()
pts = np.asarray(eng.apply_zsort(0, pts))
eng.resize_point_set(0, pts)
eng.run()   # settles caps + one-shot wcap/pack auto-tune (as bench.py)
eng.run()   # the steady-state program the benchmark times
stamp(f"knobs: pack={eng._pack} wcap={eng._wcap} dense={eng._dense_cap} "
      f"pre=({eng._pre_cap},{eng._pre_edge}) lane_batch="
      f"{eng._knobs(True).lane_batch}")
ec, en = eng.get_neighbors(0, 0)
ec, en = np.asarray(ec), np.asarray(en)
stamp(f"engine done; total pairs {ec.sum()}  stats {eng._last_stats}")

stamp("native oracle run (CPU)")
counts, offs, nbrs = no.grid_search_pair(pts, pts, radius=R, same_set=True)
stamp(f"oracle done; total pairs {counts.sum()}")

assert np.array_equal(ec, counts), \
    f"count mismatch: {np.sum(ec != counts)} points differ"
stamp("counts exact")
step = max(1, N // 20000)
for i in range(0, N, step):  # ~20k sampled exact set checks
    got = np.sort(en[i][: ec[i]])
    want = np.sort(nbrs[offs[i]:offs[i + 1]])
    assert np.array_equal(got, want), i
stamp(f"sampled neighbor sets exact ({N // step} points) — VALID")
