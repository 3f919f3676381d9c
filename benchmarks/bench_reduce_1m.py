"""Fused neighbor-reduce at 1M: SPH poly6 density, no neighbor lists.

The device visitor (`run_reduce` / `make_step_fn(reduce=...)`) folds a
user-traced per-pair contribution into per-query accumulators INSIDE the
pairs kernel — the staging compaction network, the MXU prefixes, the
merge and the CSR materialization (the dominant kernel terms at 1M, see
NOTES.md round 5) never run.  This measures the end-to-end step for the
canonical SPH consumer: rho_i = sum_j m_j (h^2 - r^2)^3 (poly6 up to the
normalization constant), against the same 1M config as bench.py.

Legs: n_out=1 (density) and n_out=4 (density + 3 gradient-like
components), both on the temporal-coherence carry step, ITERS in-graph.
Exactness: the density leg is validated against the neighbor-list path
(run() + host accumulation over the emitted lists) on a sample.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_INTERPRET"):  # CPU dry-run of the script
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

N = int(os.environ.get("BENCH_N", 1_000_000))
R = float(os.environ.get("BENCH_R", 0.02))
ITERS = int(os.environ.get("BENCH_ITERS", 50))
H2 = np.float32(R * R)


def density_fn(env):
    w = H2 - env["d2"]
    return env["p0_j"] * (w * w * w)


def density4_fn(env):
    w = H2 - env["d2"]
    k = env["p0_j"] * (w * w)
    return (k * w, k * env["dx"], k * env["dy"], k * env["dz"])


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, N).astype(np.float32)

    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(R)
    eng.set_all_searches(True)
    eng.set_cell_size(float(os.environ.get("BENCH_CELLF", 1.15)) * R)
    eng.set_record_pack(int(os.environ.get("BENCH_PACK", 8)))
    if os.environ.get("BENCH_INTERPRET"):  # CPU dry-run of the script
        eng.set_use_pallas(True, interpret=True)

    eng.prepare_zsort()
    pts = np.asarray(eng.apply_zsort(0, pts))
    mass = np.asarray(eng.apply_zsort(0, mass.reshape(-1, 1))).ravel()
    eng.resize_point_set(0, pts)

    # settle caps (wcap tune, fat snug, tiles snug) on the reduce path
    rho0 = eng.run_reduce(density_fn, 1, payload=[mass])[0][:, 0]

    # ---- exactness: neighbor-list path + host accumulation -------------
    eng.run()
    counts, nbrs = eng.get_neighbors(0, 0)
    counts = np.asarray(counts)
    nbrs = np.asarray(nbrs)
    total_pairs = int(counts.sum())
    sample = rng.choice(N, min(4000, N), replace=False)
    lanes = np.arange(nbrs.shape[1])[None, :]
    sm = nbrs[sample]
    valid = lanes < counts[sample][:, None]
    d = pts[sample][:, None, :] - pts[np.where(valid, sm, 0)]
    d2 = (d[..., 0] ** 2 + d[..., 1] ** 2) + d[..., 2] ** 2
    w = np.where(valid, (H2 - d2.astype(np.float32)) ** 3, 0.0)
    ref = (np.where(valid, mass[np.where(valid, sm, 0)], 0.0)
           * w).sum(1, dtype=np.float64)
    ok = np.allclose(rho0[sample], ref, rtol=5e-5, atol=1e-18)
    print(f"[validate] density vs neighbor-list path on 4000 samples: "
          f"{'EXACT-tol' if ok else 'MISMATCH'}", file=sys.stderr)
    if not ok:
        bad = np.argmax(np.abs(rho0[sample] - ref))
        print("  worst:", rho0[sample][bad], ref[bad], file=sys.stderr)

    points_dev = jnp.asarray(pts)
    pl = jnp.asarray(np.stack([mass, np.zeros_like(mass)], 1))

    def time_leg(fn, n_out, tag):
        step, st = eng.make_step_fn(reduce=(fn, n_out))

        @jax.jit
        def loop(points, payload, state):
            def body(_, carry):
                state, acc = carry
                sol, state = step(state, points, payload=payload)
                acc = acc + jnp.sum(sol["reduce"]["s0"][0, ::4097])
                return state, acc
            return jax.lax.fori_loop(0, ITERS, body,
                                     (state, jnp.float32(0)))

        st, acc = loop(points_dev, pl, st)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        st, acc = loop(points_dev, pl, st)
        float(acc)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"[{tag}] {dt * 1e3:.2f} ms/step", file=sys.stderr)
        return dt

    dt1 = time_leg(density_fn, 1, "density n_out=1")
    dt4 = time_leg(density4_fn, 4, "density+grad n_out=4")

    print(json.dumps({
        "metric": "fused_density_1m",
        "value": total_pairs / dt1,
        "unit": "pairs/s",
        "vs_baseline": (total_pairs / dt1) / 1.03e8,
        "ms_per_step": dt1 * 1e3,
        "ms_per_step_n_out4": dt4 * 1e3,
        "total_pairs": total_pairs,
        "n_points": N,
        "validated": bool(ok),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
