"""Pallas-pipeline floor decomposition at 1M on TPU (carry reuse path).

All configs run the steady-state reuse step (prep skipped), so each term
isolates cleanly:

  skip=6          : key check + count gathers + loop     (XLA floor)
  skip=5          : + record arrays (rec_pad + q_t builds)
  skip=4          : + pallas grid pipeline, kernels empty
  skip=4 nbr=8    : pipeline with 10x smaller output blocks
  skip=4 tps=8    : pipeline with 4x fewer, larger grid steps
  skip=4 fat=8    : fat-tier grid shrunk 1024 -> 8 steps
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
      f"tiles={eng._tiles_cap}")
pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))

CONFIGS = [
    ("skip6", dict(skip_stage=6), None),
    ("skip5", dict(skip_stage=5), None),
    ("skip4", dict(skip_stage=4), None),
    ("skip4_nbr8", dict(skip_stage=4), 8),
    ("skip4_tps8", dict(skip_stage=4, tps=8), None),
    ("skip4_fat8", dict(skip_stage=4, fat_cap=8), None),
]

for name, kn, nbr in CONFIGS:
    cfg_x = cfg._replace(nbr_cap=nbr) if nbr else cfg
    knobs = eng._knobs(True)._replace(**kn)
    carry0 = fp.make_fast_carry0(cfg_x, knobs)

    def eng_step(st, carry, points, _k=knobs, _c=cfg_x):
        return fp.build_and_search_fast_carry_jit(
            points, None, jnp.float32(R), jnp.float32(cell),
            st, carry, _c, _k)

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
    st, carry, acc = loop(pts_dev, st, carry)
    int(acc)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step")
