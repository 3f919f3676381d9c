"""10M-point benchmark through the packed-record Pallas path (BASELINE
config 5; the reference's 9M-particle Beach Scene scale,
``/root/reference/README.md:134-136``).

pack=4 record packing keeps the candidate array at 128 B/point (1.3 GB at
10M); the fused finalize gathers avoid (N, k8)-sized intermediates.
Validates counts + sampled neighbor sets against the native C++ grid
oracle, then times steady-state steps in a fori_loop.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

N = int(os.environ.get("N", 10_000_000))
R = float(os.environ.get("R", 0.0101))
ITERS = int(os.environ.get("ITERS", 5))
VALIDATE = int(os.environ.get("VALIDATE", 1))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)

eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(R)
eng.set_all_searches(True)
# preset caps: a regrow recompile at 10M costs minutes, so start at the
# measured-good values (~43 avg neighbors at R=0.0101)
eng.set_neighbor_cap(int(os.environ.get("NBR", 96)))
eng.set_cell_size(float(os.environ.get("CELLF", 1.0)) * R)
eng._pack = int(os.environ.get("PACK", 4))
eng._wcap = int(os.environ.get("WCAP", 192))
eng._pre_cap = int(os.environ.get("PRECAP", 96))
eng._dense_cap = 1 << 21   # 111^3 padded grid = 1.37M cells
if "TILES" in os.environ:
    eng._tiles_cap = int(os.environ["TILES"])
stamp(f"run {N} (pallas pack=4)")
eng.run()
counts = np.asarray(eng.get_neighbors(0, 0)[0])
total = int(counts.sum())
stamp(f"done; stats {eng._last_stats}; total pairs {total} "
      f"avg {counts.mean():.1f} caps w={eng._wcap} fat=({eng._fat_wcap},"
      f"{eng._fat_cap}) tiles={eng._tiles_cap} nbr={eng._nbr_cap}")

if VALIDATE:
    from treensearch_tpu import native_oracle as no
    stamp("native oracle (CPU)")
    oc, offs, onb = no.grid_search_pair(pts, pts, radius=R, same_set=True)
    assert np.array_equal(counts, oc), \
        f"count mismatch at {np.sum(counts != oc)} points"
    en = np.asarray(eng.get_neighbors(0, 0)[1])
    step_i = max(1, N // 5000)
    for i in range(0, N, step_i):
        got = np.sort(en[i][: counts[i]])
        want = np.sort(onb[offs[i]:offs[i + 1]])
        assert np.array_equal(got, want), i
    stamp(f"exact ({N // step_i} sampled sets)")

step, st0 = eng.make_step_fn()
p = jnp.asarray(pts)


@jax.jit
def loop(p, st):
    def body(_, carry):
        st, acc = carry
        sol, st = step(st, p)
        p2 = sol["pairs"]["0-0"]
        pass  # counts-only checksum; nbr blocks now live in sol["blocks"]
        return st, acc + jnp.sum(p2["counts"][::257], dtype=jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))


st, acc = loop(p, st0)
int(acc)
t0 = time.perf_counter()
st, acc = loop(p, st0)
int(acc)
ms = (time.perf_counter() - t0) / ITERS * 1e3
print(json.dumps({"metric": "pairs_10M_pallas", "ms_per_run": ms,
                  "value": total / (ms / 1e3), "unit": "pairs/s",
                  "total_pairs": total}), flush=True)
