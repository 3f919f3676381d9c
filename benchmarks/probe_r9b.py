"""Round-5: full attribution ladder at the r9a headline config
(pack=8, cell=1.15r, win_sorted expand build) — where does 78.6 ms sit?

Rungs (all attribution-only except the exact baseline):
  probe_mode 1/2/3: window DMAs only / + field extracts / + mask math
  skip_stage 3/1:   kernel body off (grid+pipeline floor) / no staging
  net_cap 1/4:      truncated compaction network (prices the strides)
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import treensearch_tpu.ops.fastpath as fp
from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops.grid import fresh_state

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
CELLF = float(os.environ.get("CELLF", 1.15))
ITERS = int(os.environ.get("ITERS", 10))

def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

rng = np.random.default_rng(0)
pts_np = rng.uniform(0, 1, (N, 3)).astype(np.float32)
eng = TreeNSearch()
eng.add_point_set(pts_np)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.prepare_zsort()
pts_np = np.asarray(eng.apply_zsort(0, pts_np))
eng.resize_point_set(0, pts_np)
eng.set_cell_size(CELLF * R)
eng.set_record_pack(int(os.environ.get("PACK", 8)))
if "WCAP" in os.environ:
    eng.set_window_cap(int(os.environ["WCAP"]))
eng.run(); eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: total={total}  knobs: pack={eng._pack} wcap={eng._wcap} "
      f"pre=({eng._pre_cap},{eng._pre_edge}) lb={eng._lane_batch} "
      f"tiles={eng._tiles_cap}")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
knobs0 = eng._knobs(True)
state0 = fresh_state()

def timeloop(fn):
    @jax.jit
    def loop(points, st0):
        def body(i, c):
            st, acc = c
            acc2, st = fn(points, st)
            return st, acc + acc2
        return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))
    st, acc = loop(pts_dev, state0)
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, state0)
    a = int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    return dt, a

def step_rung(name, check_total=False, **kn):
    knobs = knobs0._replace(**kn)
    def fn(points, st):
        sol, st2 = fp.build_and_search_fast(
            points, None, jnp.float32(R), jnp.float32(cell), st, cfg, knobs)
        pr = sol["pairs"]["0-0"]
        s = jnp.sum(pr["counts"], dtype=jnp.int32) if check_total \
            else jnp.sum(pr["counts"][::257], dtype=jnp.int32)
        return s, st2
    dt, a = timeloop(fn)
    if check_total:
        ok = "EXACT" if a == ITERS * total else f"MISMATCH {a}"
        stamp(f"{name}: {dt:.1f} ms/step ({ok})")
    else:
        stamp(f"{name}: {dt:.1f} ms/step (acc={a})")

step_rung("FULL (baseline)", check_total=True)
step_rung("P1 window DMAs only", probe_mode=1)
step_rung("P2 + field extracts", probe_mode=2)
step_rung("P3 + mask arithmetic", probe_mode=3)
step_rung("S3 kernel body off (grid floor)", skip_stage=3)
step_rung("S1 no staging compaction", skip_stage=1)
step_rung("S2 no merge either", skip_stage=2)
step_rung("N4 net_cap=4", net_cap=4)
step_rung("N1 net_cap=1", net_cap=1)
stamp("probe_r9b done")
