"""BASELINE config 5 AS SPECIFIED: 10M points, THREE sets, all-active
matrix (9 directed pairs), full step loop with a zsort cadence, plus a
forced-overflow regrow demonstration and native-oracle sampled parity.

The reference frames this scale via the paper's 9M-particle Beach Scene
(``/root/reference/README.md:134-136``).  The 9 active pairs run through
the Pallas engine as THREE candidate-set blocks (ops/pallas_pairs.py v4);
the zsort cadence uses the fused in-graph step (ops/zsort.py
``make_zsort_step``): every ZSORT_EVERY-th iteration recomputes per-set
Morton orders and reorders positions + velocity + density + 6 more user
arrays entirely on device.

Env: ITERS (default 6), ZSORT_EVERY (3), VALIDATE (1), REGROW (1).
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
from treensearch_tpu.ops.zsort import make_zsort_step

SCALE = float(os.environ.get("SCALE", 1.0))
# fluid, boundary, emitter
N0, N1, N2 = (int(8_000_000 * SCALE), int(1_500_000 * SCALE),
              int(500_000 * SCALE))
R = float(os.environ.get("R", 0.009)) / SCALE ** (1 / 3)
ITERS = int(os.environ.get("ITERS", 6))
ZSORT_EVERY = int(os.environ.get("ZSORT_EVERY", 3))
VALIDATE = int(os.environ.get("VALIDATE", 1))
REGROW = int(os.environ.get("REGROW", 1))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


rng = np.random.default_rng(0)
sets_np = [rng.uniform(0, 1, (n, 3)).astype(np.float32)
           for n in (N0, N1, N2)]

eng = TreeNSearch()
for p in sets_np:
    eng.add_point_set(p)
eng.set_search_radius(R)
eng.set_all_searches(True)          # 9 directed pairs
# cell = 1.1r default: the 1M re-sweep optimum holds at 10M too
# (1.0r -> 1293.0 ms/step, 1.1r -> 1270.5; benchmarks/bench_10m_cfg5_r7n.out)
eng.set_cell_size(float(os.environ.get("CELLF", 1.1)) * R)
# preset caps: a regrow recompile at 10M costs minutes (the ergonomics
# documented in STATUS; the regrow DEMO below exercises the path anyway)
eng.set_neighbor_cap(int(os.environ.get("NBR", 64)))
# thin sets get right-sized outputs (the fluid's cap would cost 3x HBM)
eng.set_neighbor_cap(int(os.environ.get("NBR1", 16)), set_j=1)
eng.set_neighbor_cap(int(os.environ.get("NBR2", 8)), set_j=2)
eng.set_prestage_caps(int(os.environ.get("PRECAP", 64)),
                      int(os.environ.get("PREEDGE", 48)))
# snug tile budget: occupied rows pad 10M points to ~85k tiles; the 25%
# default slack would cost ~1 GB of output blocks.  The whole working
# set is sized for the ~8 GB effective HBM observed through this tunnel
# (three 10M attempts at ~8 GB computed footprints hit
# RESOURCE_EXHAUSTED; the r2 single-set 10M run at ~6 GB fit).
eng._tiles_cap = int(int(os.environ.get("TILES", 88000)) * SCALE)
eng._fat_cap = int(os.environ.get("FATCAP", 512))
if "PACK" in os.environ:   # pack sweep (r8: pack=8 beat 16 at 1M)
    eng.set_record_pack(int(os.environ["PACK"]))
if "SPLIT" in os.environ:  # two-pass split-staging kernel
    eng.set_split_stage(bool(int(os.environ["SPLIT"])))
# at this scale HBM is the binding constraint: skip the carry's extra
# buffers/liveness (every step re-sorts anyway under motion)
eng.set_coherence(False)

stamp(f"first run: {N0}+{N1}+{N2} pts, 9 pairs (3 candidate blocks)")
eng.run()
stamp(f"settled: {eng._last_stats} wcap={eng._wcap} pack={eng._pack} "
      f"fat=({eng._fat_wcap},{eng._fat_cap}) tiles={eng._tiles_cap} "
      f"nbr={eng._nbr_cap} pre=({eng._pre_cap},{eng._pre_edge}) "
      f"dense={eng._dense_cap}")

# counts-only accounting (materializing all nine per-point views costs
# ~6 GB on top of the live blocks -> use the counts-only accessor)
pair_totals = {}
total_all = 0
for i in range(3):
    for j in range(3):
        t = int(eng.get_counts(i, j).sum())
        pair_totals[f"{i}-{j}"] = t
        total_all += t
stamp(f"total pairs over 9 searches: {total_all}; per pair {pair_totals}")

# ---- sampled native-oracle parity for two pairs ------------------------
if VALIDATE:
    from treensearch_tpu import native_oracle as no
    if no.available():
        # validate the two pairs whose per-point views fit alongside the
        # live blocks (set_i = boundary/emitter; the 8M-row fluid view
        # alone is ~3 GB)
        for (si, sj) in ((1, 0), (2, 1)):
            cnt = eng.get_counts(si, sj)
            counts_ref, offs_ref, nbrs_ref = no.grid_search_pair(
                sets_np[si], sets_np[sj], radius=R, same_set=(si == sj))
            assert np.array_equal(cnt, counts_ref), f"counts differ {si}-{sj}"
            sample = rng.choice(sets_np[si].shape[0], 2000, replace=False)
            nbrs = np.asarray(eng.get_neighbors(si, sj)[1])
            for i in sample:
                got = np.sort(nbrs[i][: cnt[i]])
                want = np.sort(nbrs_ref[offs_ref[i]:offs_ref[i + 1]])
                assert np.array_equal(got, want), (si, sj, i)
            stamp(f"pair {si}-{sj}: counts exact on all "
                  f"{cnt.shape[0]} pts; neighbor sets exact on 2000 samples")
            del nbrs
    else:
        stamp("native oracle unavailable; skipping parity")

# release the first run's multi-GB solution before the timing loop
# allocates its own working set of the same size
eng._solution = None

# ---- steady-state loop with in-graph zsort cadence ---------------------
step, st0 = eng.make_step_fn()
zstep = make_zsort_step(n_sets=3)
pts_dev = [jnp.asarray(p) for p in sets_np]
# 8 user arrays riding the zsort (velocities + densities + scalars)
user = [[jnp.zeros((p.shape[0], 3)), jnp.zeros((p.shape[0],)),
         jnp.zeros((p.shape[0],))] for p in pts_dev]


@jax.jit
def loop(pts, user, st):
    def body(it, carry):
        pts, user, st, acc = carry
        do_z = (it % ZSORT_EVERY) == (ZSORT_EVERY - 1)

        def with_z(args):
            pts, user = args
            _, pts2, user2 = zstep(pts, user)
            return pts2, user2

        pts, user = jax.lax.cond(do_z, with_z, lambda a: a, (pts, user))
        points = jnp.concatenate(pts, axis=0)
        sol, st = step(st, points)
        acc = acc + jnp.sum(sol["pairs"]["0-0"]["counts"][::1025],
                            dtype=jnp.int32)
        return pts, user, st, acc
    return jax.lax.fori_loop(0, ITERS, body, (pts, user, st,
                                              jnp.int32(0)))


stamp("compiling the fused step+zsort loop ...")
outs = loop(pts_dev, user, st0)
jax.block_until_ready(outs[-1])
t0 = time.perf_counter()
outs = loop(pts_dev, user, st0)
int(np.asarray(outs[-1]))
dt = (time.perf_counter() - t0) / ITERS * 1e3
pairs_s = total_all / (dt / 1e3)
stamp(f"steady state (search every step + fused 3-set zsort of "
      f"positions+8 arrays every {ZSORT_EVERY}): {dt:.1f} ms/step, "
      f"{pairs_s:.3e} pairs/s over 9 pairs")
print(json.dumps({
    "metric": "cfg5_10m_3sets_zsort", "value": pairs_s, "unit": "pairs/s",
    "ms_per_step": dt, "total_pairs": total_all, "n_points": N0 + N1 + N2,
    "zsort_every": ZSORT_EVERY, "pairs": 9}), flush=True)

# ---- forced-overflow regrow demonstration ------------------------------
if REGROW:
    stamp("forcing a neighbor-cap overflow (cap 32) ...")
    os.environ["TNS_DEBUG_REGROW"] = "1"
    import treensearch_tpu.api as api
    api._DEBUG_REGROW = True
    eng._nbr_caps[0] = 32
    eng._solution = None
    eng._carry_key = None   # cap change reshapes the carry
    t0 = time.perf_counter()
    eng.run()
    stamp(f"regrow converged in {time.perf_counter() - t0:.0f}s; "
          f"fluid-block cap now {eng._cap_of(0)}")
    assert int(eng.get_counts(0, 0).sum()) == pair_totals["0-0"]
    stamp("post-regrow results identical")
