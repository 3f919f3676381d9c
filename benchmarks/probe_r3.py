"""Round-3 stage attribution at 1M on TPU with the v4 kernel.

Measures the full step plus the skip_stage ladder (see FastKnobs):
  skip=4: pure grid pipeline (no kernel body, no output init)
  skip=3: + output init writes (the writeback floor)
  skip=2: + DMA + masks + counts
  skip=1: + final merge
  skip=0: full kernel (per-window compaction included)
Everything at auto-tuned wcap / pack, cell = 1.0*r, TPS from env.
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

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
ITERS = int(os.environ.get("ITERS", 10))
CELLF = float(os.environ.get("CELLF", 1.0))
SKIPS = [int(s) for s in os.environ.get("SKIPS", "0,4,3,2,1").split(",")]

rng = np.random.default_rng(0)
pts_np = rng.uniform(0, 1, (N, 3)).astype(np.float32)


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


eng = TreeNSearch()
eng.add_point_set(pts_np)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.prepare_zsort()
pts_np = np.asarray(eng.apply_zsort(0, pts_np))
eng.resize_point_set(0, pts_np)
eng.set_cell_size(CELLF * R)
if "WCAP" in os.environ:
    eng.set_window_cap(int(os.environ["WCAP"]))
if "PACK" in os.environ:
    eng.set_record_pack(int(os.environ["PACK"]))
if "TPS" in os.environ:
    eng.set_tiles_per_step(int(os.environ["TPS"]))
eng.run()  # settles caps; may retrace once after the auto-tune
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: total={total} wcap={eng._wcap} pack={eng._pack} "
      f"pre=({eng._pre_cap},{eng._pre_edge}) fat=({eng._fat_wcap},"
      f"{eng._fat_cap}) dense={eng._dense_cap} tiles={eng._tiles_cap} "
      f"tps={eng._tps}")
pts_dev = jnp.asarray(pts_np)

cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))

for skip in SKIPS:
    knobs = eng._knobs(True)._replace(skip_stage=skip)

    def eng_step(state, points, radii=None, _k=knobs):
        return fp.build_and_search_fast_jit(
            points, radii, jnp.float32(R), jnp.float32(cell), state,
            cfg, _k)

    @jax.jit
    def loop(points, st, _step=eng_step):
        def body(i, carry):
            st, acc = carry
            sol, st = _step(st, points)
            p = sol["pairs"]["0-0"]
            return st, acc + jnp.sum(p["counts"][::257], dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))

    from treensearch_tpu.ops.grid import fresh_state
    st, acc = loop(pts_dev, fresh_state())
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, fresh_state())
    int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    pairs_s = total / (dt / 1e3)
    stamp(f"skip={skip}: {dt:.1f} ms/step  ({pairs_s:.3e} pairs/s)")
