"""HISTORICAL: rg2 (2x2 row-group query tiles) vs rg1 at 1M on TPU.

Ran against the round-3 rg2 build; rg2 measured slower than rg1 AND
dropped 0.19% of pairs at 1M, so it was removed (see NOTES.md).  Kept
with probe_r3f.out as the record; the script no longer runs as-is.

The engine auto-tunes wcap per layout (rg2 windows are ~40% shorter).
Reports full-step time for: rg2 auto-tuned, rg2 at a couple of forced
wcaps, and rg1 at the r3e-best (192).
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
eng.run()   # rg2 by default; auto-tunes wcap from rg2 window hist
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled rg2: total={total} wcap={eng._wcap} pack={eng._pack} "
      f"pre=({eng._pre_cap},{eng._pre_edge}) fat=({eng._fat_wcap},"
      f"{eng._fat_cap}) tiles={eng._tiles_cap} dense={eng._dense_cap}")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
wcap_auto = eng._wcap

CONFIGS = [
    (f"rg2 wcap={wcap_auto} (auto)", {}),
    ("rg2 wcap=96", dict(wcap=96)),
    ("rg2 wcap=128", dict(wcap=128)),
    ("rg2 skip4", dict(skip_stage=4)),
    ("rg1 wcap=192", dict(wcap=192)),
]

for name, kn in CONFIGS:
    knobs = eng._knobs(True)._replace(**kn)

    def estep(st, points, _k=knobs):
        return fp.build_and_search_fast_jit(
            points, None, jnp.float32(R), jnp.float32(cell), st, cfg, _k)

    @jax.jit
    def loop(points, st, _step=estep):
        def body(i, c):
            st, acc = c
            sol, st = _step(st, points)
            p = sol["pairs"]["0-0"]
            flags = sol["tile_overflow"] + sol["cand_max"] \
                + sol["pre_surv_max"]
            return st, acc + jnp.sum(p["counts"][::257], dtype=jnp.int32) \
                + 0 * flags
        return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))

    # separate overflow check once (flags must be clean for a fair time)
    sol, _ = estep(fresh_state(), pts_dev)
    flg = {k: int(np.asarray(sol[k])) for k in
           ("tile_overflow", "rows_overflow", "cand_max", "pre_surv_max",
            "pre_surv_edge_max")}
    st, acc = loop(pts_dev, fresh_state())
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, st)
    int(np.asarray(acc))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step ({total / dt * 1e3:.3e} pairs/s) "
          f"flags={flg}")
