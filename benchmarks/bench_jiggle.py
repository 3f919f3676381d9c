"""Temporal-coherence (FastCarry) benchmark — the TPU answer to the
reference's cross-run coherence machinery (``TreeNSearch.cpp:417-424``).

Workloads per size, all through ``make_step_fn(reuse=True)``:

  static   : positions identical every step (solver-iteration pattern —
             PCISPH/DFSPH run several constraint iterations per position
             update; every step after the first reuses the carried sort/
             table/layout/descriptors and rebuilds only the records)
  jiggle   : every step moves every point by ~1e-3 cell.  At N >= 1M some
             point crosses a cell boundary essentially every step, the
             device check detects it, and the step rebuilds — results
             stay exact; this measures the rebuild path under motion.

The carry is exact by construction (reuse only when a stable re-sort
would be bit-identical); ``rebuilt`` counts how many steps rebuilt.
"""
import json
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

ITERS = int(os.environ.get("ITERS", 10))
SIZES = [int(x) for x in os.environ.get("SIZES", "1000000,4000000").split(",")]


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


for N in SIZES:
    r = 0.02 * (1_000_000 / N) ** (1 / 3)   # keep ~32.8 avg neighbors
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(r)
    eng.set_all_searches(True)
    eng.set_cell_size(1.0 * r)
    eng.prepare_zsort()
    pts = np.asarray(eng.apply_zsort(0, pts))
    eng.resize_point_set(0, pts)
    eng.run()
    total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
    stamp(f"N={N}: settled, total={total}, wcap={eng._wcap} "
          f"pack={eng._pack}")

    step, state0 = eng.make_step_fn(reuse=True)
    pts_dev = jnp.asarray(pts)
    cell = eng._effective_cell_size()
    jig = np.float32(1e-3 * cell)

    for mode in ("static", "jiggle"):
        @jax.jit
        def loop(points, st, seed, _mode=mode):
            def body(i, c):
                points, st, acc, reb = c
                if _mode == "jiggle":
                    key = jax.random.fold_in(jax.random.PRNGKey(0),
                                             seed + i)
                    points = points + jax.random.uniform(
                        key, points.shape, jnp.float32, -jig, jig)
                sol, st = step(st, points)
                acc = acc + jnp.sum(sol["pairs"]["0-0"]["counts"][::257],
                                    dtype=jnp.int32)
                return points, st, acc, reb + sol["rebuilt"]
            return jax.lax.fori_loop(
                0, ITERS, body, (points, st, jnp.int32(0), jnp.int32(0)))

        p2, st, acc, reb = loop(pts_dev, state0, 0)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        p2, st, acc, reb = loop(p2, st, 100)
        n_reb = int(np.asarray(reb))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({
            "metric": f"coherence_{mode}_{N}",
            "value": total / (dt / 1e3), "unit": "pairs/s",
            "ms_per_step": dt, "rebuilt_steps": n_reb,
            "iters": ITERS}), flush=True)
