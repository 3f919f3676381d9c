"""Exact-parity validation of the full TPU engine at 1M points against the
native C++ grid oracle (the numpy O(n^2) oracle is infeasible here)."""
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

stamp("engine run (TPU)")
eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.run()
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
