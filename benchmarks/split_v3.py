"""Surgical stage attribution for the v3 kernel on TPU: times the best
config with compaction stages disabled (skip_stage dev knob).

  skip=2: prep + DMA + masks + counts          (no emission at all)
  skip=1: + final merge over outc (-1s)        (merge cost)
  skip=0: + per-window compaction              (full kernel)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
ITERS = int(os.environ.get("ITERS", 10))
WCAP = int(os.environ.get("WCAP", 192))
PACK = int(os.environ.get("PACK", 4))
CELLF = float(os.environ.get("CELLF", 1.0))

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
eng._wcap, eng._pack = WCAP, PACK
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled caps; total={total} fat=({eng._fat_wcap},{eng._fat_cap})")
pts_dev = jnp.asarray(pts_np)

for skip in (3, 2):
    eng._last_knob_skip = skip
    # thread the dev knob through a custom step fn
    import treensearch_tpu.ops.fastpath as fp
    eng_step, st0 = eng.make_step_fn()
    if skip:
        # rebuild knobs with skip_stage via the private path
        from treensearch_tpu.config import SearchConfig
        cell = eng._effective_cell_size()
        cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
        knobs = fp.FastKnobs(wcap=eng._wcap, dense_cap=eng._dense_cap,
                             use_pallas=True, pre_cap=eng._pre_cap,
                             fat_wcap=eng._fat_wcap, fat_cap=eng._fat_cap,
                             tiles_cap=eng._tiles_cap, pack=eng._pack,
                             skip_stage=skip)

        def eng_step(state, points, radii=None, _c=cell, _cfg=cfg,
                     _k=knobs):
            return fp.build_and_search_fast_jit(
                points, radii, jnp.float32(R), jnp.float32(_c), state,
                _cfg, _k)

    @jax.jit
    def loop(points, st, _step=eng_step):
        def body(i, carry):
            st, acc = carry
            sol, st = _step(st, points)
            p = sol["pairs"]["0-0"]
            pass  # counts-only checksum; nbr blocks now live in sol["blocks"]
            return st, acc + jnp.sum(p["counts"][::257], dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))

    st, acc = loop(pts_dev, st0)
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, st0)
    int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"skip={skip}: {dt:.1f} ms/step")
