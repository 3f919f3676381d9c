"""Round-4 kernel attribution ladder at 1M: split the ~77 ms kernel into
DMA / field-extract / mask-arithmetic / prefix+counts / merge / compaction.

Ladder (each rung adds one term; rebuild step, bench.py configuration):

  A0 skip=3   : grid + prep + records + pipeline, kernel body off
  A1 probe=1  : + window DMAs (issue + wait, 9 per tile)
  A2 probe=2  : + per-phase field extracts (lane slices, no broadcast)
  A3 probe=3  : + full mask arithmetic (broadcast + d2 + range masks)
  A4 skip=2   : + MXU per-phase prefixes + counts + wsc bookkeeping
  A5 skip=1   : + analytic merge network (window staging = -1 fill)
  A6 full     : + per-window compaction networks
  A7 full, mxu_prefix=False : VPU-cumsum prefix reference point
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


def run_case(name, skip=0, probe=0, **kn):
    knobs = knobs0._replace(skip_stage=skip, probe_mode=probe, **kn)

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


run_case("A0 kernel body off (skip3)", skip=3)
run_case("A1 + window DMAs (probe1)", probe=1)
run_case("A2 + field extracts (probe2)", probe=2)
run_case("A3 + mask arithmetic (probe3)", probe=3)
run_case("A4 + prefix/counts (skip2)", skip=2)
run_case("A5 + merge (skip1)", skip=1)
run_case("A6 full", skip=0)
run_case("A7 full, VPU prefix", skip=0, mxu_prefix=False)
