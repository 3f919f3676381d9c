"""Round-4: price the staging compaction NETWORK separately from its
surroundings (mask reblocks, packed-value build, staged writes).

The r7 ladders put the whole "R0 compact" rung at ~31 ms/step at 1M, but
that rung covers reblock+encode+network+writes together.  The net_cap
dev knob truncates the shift network to K stride steps (results wrong,
attribution only): full(8 strides) - net_cap=1 ~= 7 strides' cost, which
decides whether a grouped two-level network (fewer full-height strides)
can pay.

Run at the headline config (cell=1.1r, auto knobs).
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
CELLF = float(os.environ.get("CELLF", 1.1))
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
if "PACK" in os.environ:
    eng.set_record_pack(int(os.environ["PACK"]))
if "WCAP" in os.environ:
    eng.set_window_cap(int(os.environ["WCAP"]))
eng.run()
eng.run()
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


step_rung("N8 full network (baseline)", check_total=True)
step_rung("N4 net_cap=4 (half the strides)", net_cap=4)
step_rung("N1 net_cap=1 (one stride)", net_cap=1)
step_rung("N0 skip_stage=1 (no staging at all)", skip_stage=1)
stamp("probe_r8b done")
