"""Headline benchmark: neighbor-pairs/second at 1M points on one chip.

Mirrors the measured reference baseline (BASELINE.md): 1,000,000
uniform-random points in the unit cube, fixed radius 0.02 (~32.8 average
neighbors, ~32.75M output pairs), steady-state `run()` every step as points
jiggle.  The reference AVX2 build measured 1.03e8 pairs/s in this
container; `vs_baseline` is pairs/s against that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

BASELINE_PAIRS_PER_S = 1.03e8  # BASELINE.md, AVX2 CPU at 1M points
N = int(os.environ.get("BENCH_N", 1_000_000))
RADIUS = float(os.environ.get("BENCH_R", 0.02))
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(RADIUS)
    eng.set_all_searches(True)

    # Settle the padding caps (auto-grow/recompile path) and warm the cache,
    # then time the steady-state jitted step on device-resident data — the
    # intended TPU usage (an SPH loop living on device).
    eng.prepare_zsort()
    pts = eng.apply_zsort(0, pts)
    eng.resize_point_set(0, pts)
    eng.run()
    counts, _ = eng.get_neighbors(0, 0)
    total_pairs = int(jnp.sum(counts))

    step, state0 = eng.make_step_fn()
    points_dev = jnp.asarray(pts)
    sol, state = step(state0, points_dev)
    jax.block_until_ready(sol)

    # jiggle points on device between steps (simulates SPH motion) without
    # including the jiggle in the timed region: pre-generate a few variants
    variants = []
    for k in range(4):
        d = rng.uniform(-1e-4, 1e-4, (N, 3)).astype(np.float32)
        variants.append(jnp.asarray(pts + d))
    for v in variants:
        sol, state = step(state, v)  # warm every shape/path
    jax.block_until_ready(sol)

    t0 = time.perf_counter()
    for i in range(ITERS):
        sol, state = step(state, variants[i % len(variants)])
    jax.block_until_ready(sol)
    dt = (time.perf_counter() - t0) / ITERS

    pairs_per_s = total_pairs / dt
    print(json.dumps({
        "metric": "neighbor_pairs_per_sec_1M",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_s / BASELINE_PAIRS_PER_S,
        "ms_per_run": dt * 1e3,
        "total_pairs": total_pairs,
        "n_points": N,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
