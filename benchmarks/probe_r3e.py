"""Confirm the epilogue-fusion fix (optimization barriers around the
count gather) and re-check the P7 pack=4 rebuild anomaly, 1M on TPU.

  E1 reuse  skip6          (epilogue floor; was 70.3 pre-barrier)
  E2 reuse  full   pack4   (was 189.4)
  E3 rebuild full  pack4   (was 3774.9?! — anomaly check)
  E4 rebuild full  pack8   (was 179.6)
  E5 reuse  full   pack8
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
stamp(f"settled: total={total} pack={eng._pack} dense={eng._dense_cap} "
      f"tiles={eng._tiles_cap} pre=({eng._pre_cap},{eng._pre_edge})")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
knobs0 = eng._knobs(True)


def step_loop(knobs, reuse):
    if reuse:
        def estep(st, carry, points):
            return fp.build_and_search_fast_carry_jit(
                points, None, jnp.float32(R), jnp.float32(cell),
                st, carry, cfg, knobs)
    else:
        def estep(st, carry, points):
            sol, st = fp.build_and_search_fast_jit(
                points, None, jnp.float32(R), jnp.float32(cell),
                st, cfg, knobs)
            return sol, st, carry

    @jax.jit
    def loop(points, st, carry):
        def body(i, c):
            st, carry, acc = c
            sol, st, carry = estep(st, carry, points)
            p = sol["pairs"]["0-0"]
            return st, carry, acc + jnp.sum(p["counts"][::257],
                                            dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, (st, carry, jnp.int32(0)))
    return loop


for name, kn, reuse in (
        ("E1 reuse skip6", dict(skip_stage=6), True),
        ("E2 reuse full pack4", dict(), True),
        ("E3 rebuild full pack4", dict(), False),
        ("E4 rebuild full pack8", dict(pack=8), False),
        ("E5 reuse full pack8", dict(pack=8), True)):
    knobs = knobs0._replace(**kn)
    carry_x = fp.make_fast_carry0(cfg, knobs)
    loop = step_loop(knobs, reuse)
    st, carry_x, acc = loop(pts_dev, fresh_state(), carry_x)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, carry_x, acc = loop(pts_dev, st, carry_x)
    int(np.asarray(acc))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step ({total / dt * 1e3:.3e} pairs/s)")
