"""Floor decomposition via the FastCarry reuse path at 1M on TPU.

With static points the carry path skips sort+table+layout+descriptors
every step, leaving: key check + record build + kernel (+ pipeline).
Combining with skip_stage isolates each term:

  rebuild skip=4  = prep + records + pipeline floor      (known ~103)
  reuse   skip=4  = check + records + pipeline floor
  reuse   skip=0  = check + records + full kernel        (steady state)
  rebuild skip=0  = full step                            (known ~213)

Run at wcap in {192, 288} to revisit the r2 wcap tuning point.
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
WCAPS = [int(x) for x in os.environ.get("WCAPS", "192,288").split(",")]


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
eng.run()
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: total={total} wcap={eng._wcap} pack={eng._pack} "
      f"pre=({eng._pre_cap},{eng._pre_edge}) dense={eng._dense_cap} "
      f"tiles={eng._tiles_cap}")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))

for wc in WCAPS:
    for mode, skip in (("reuse", 4), ("reuse", 0), ("rebuild", 0)):
        knobs = eng._knobs(True)._replace(skip_stage=skip, wcap=wc)
        carry0 = fp.make_fast_carry0(cfg, knobs)

        if mode == "reuse":
            def eng_step(st, carry, points, _k=knobs):
                return fp.build_and_search_fast_carry_jit(
                    points, None, jnp.float32(R), jnp.float32(cell),
                    st, carry, cfg, _k)
        else:
            def eng_step(st, carry, points, _k=knobs):
                sol, st = fp.build_and_search_fast_jit(
                    points, None, jnp.float32(R), jnp.float32(cell),
                    st, cfg, _k)
                return sol, st, carry

        @jax.jit
        def loop(points, st, carry, _step=eng_step):
            def body(i, c):
                st, carry, acc = c
                sol, st, carry = _step(st, carry, points)
                p = sol["pairs"]["0-0"]
                return st, carry, acc + jnp.sum(p["counts"][::257],
                                                dtype=jnp.int32)
            return jax.lax.fori_loop(0, ITERS, body,
                                     (st, carry, jnp.int32(0)))

        st, carry, acc = loop(pts_dev, fresh_state(), carry0)
        int(acc)
        t0 = time.perf_counter()
        # warm carry carried over: steady-state (all-reuse) measurement
        st, carry, acc = loop(pts_dev, st, carry)
        int(acc)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        stamp(f"wcap={wc} {mode} skip={skip}: {dt:.1f} ms/step "
              f"({total / dt * 1e3:.3e} pairs/s)")
