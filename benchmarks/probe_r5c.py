"""Lane-batch round 2 at 1M: tps/pack sweep around the probe_r5b winner
(pack16 wcap256 lane_batch 114.8 ms), then the attribution ladder at the
best configuration.
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

import treensearch_tpu.ops.fastpath as fp
from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops.grid import fresh_state

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
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
eng.set_cell_size(1.0 * R)
eng.set_window_cap(192)
eng.run()
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: total={total}")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
knobs0 = eng._knobs(True)


def run_case(name, check_total=True, **kn):
    knobs = knobs0._replace(**kn)

    @jax.jit
    def loop(points, st0):
        def body(i, c):
            st, acc = c
            sol, st = fp.build_and_search_fast(
                points, None, jnp.float32(R), jnp.float32(cell), st, cfg,
                knobs)
            pr = sol["pairs"]["0-0"]
            s = jnp.sum(pr["counts"], dtype=jnp.int32) if check_total \
                else jnp.sum(pr["counts"][::257], dtype=jnp.int32)
            return st, acc + s
        return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))

    st, acc = loop(pts_dev, fresh_state())
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, fresh_state())
    a = int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    if check_total:
        ok = "EXACT" if a == ITERS * total else f"MISMATCH {a}"
        stamp(f"{name}: {dt:.1f} ms/step ({ok})")
    else:
        stamp(f"{name}: {dt:.1f} ms/step (acc={a})")


LB = dict(lane_batch=True, pack=16, wcap=256)
run_case("C0 lb pack16 wcap256 tps4", tps=4, **LB)
run_case("C1 lb pack16 wcap256 tps8", tps=8, **LB)
run_case("C2 lb pack8 wcap192 tps4", lane_batch=True, pack=8, tps=4)
run_case("C3 lb pack16 wcap384 tps4", lane_batch=True, pack=16, wcap=384,
         tps=4)
# attribution ladder at the r5b winner (pack16 wcap256 tps2)
run_case("L0 kernel off", check_total=False, skip_stage=3, **LB)
run_case("L1 + DMA", check_total=False, probe_mode=1, **LB)
run_case("L3 + masks", check_total=False, probe_mode=3, **LB)
run_case("L4 + prefix/counts", check_total=False, skip_stage=2, **LB)
run_case("L5 + merge", check_total=False, skip_stage=1, **LB)
