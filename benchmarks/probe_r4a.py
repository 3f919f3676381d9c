"""Fresh rebuild-path decomposition at 1M after the round-3 late levers
(DMA prefetch, composed-map records, row-arithmetic tile stats).

skip_stage ladder on the REBUILD step (prep every iteration, as bench.py
runs):

  skip=6 : grid + prep + epilogue, record build DCE'd     (XLA floor)
  skip=5 : + record arrays (rec_pad + q_t)
  skip=4 : + pallas grid pipeline, kernels empty
  skip=0 : full step
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


def run_skip(name, skip, **kn):
    knobs = knobs0._replace(skip_stage=skip, **kn)

    @jax.jit
    def loop(points, st0):
        def body(i, c):
            st, acc = c
            sol, st = fp.build_and_search_fast(
                points, None, jnp.float32(R), jnp.float32(cell), st, cfg,
                knobs)
            pr = sol["pairs"]["0-0"]
            return st, acc + jnp.sum(pr["counts"][::257], dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))

    st, acc = loop(pts_dev, fresh_state())
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(pts_dev, fresh_state())
    int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step (acc={int(acc)})")


run_skip("S6 xla floor (no records)", 6)
run_skip("S5 + record arrays", 5)
run_skip("S4 + empty pallas pipeline", 4)
run_skip("S0 full", 0)
run_skip("S0 full + phase_prefix", 0, phase_prefix=True)
run_skip("S0 full + packed_carry", 0, packed_carry=True)
run_skip("S0 full + pp + pc", 0, phase_prefix=True, packed_carry=True)
