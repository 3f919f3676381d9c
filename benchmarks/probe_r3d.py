"""Pin the ~86 ms XLA-side floor (probe_r3c skip6) at 1M on TPU.

Ad-hoc loops build the step up one stage at a time:

  P0  update_grid + quantize/lin + consume        (baseline loop)
  P1  + carry key check (gather + compare-all)
  P2  + lax.cond (reuse branch taken), carry consumed via barrier
  P3  _pallas_prep EVERY step, no cond (straight-line prep cost)
  P4  reuse skip=6 with the NEW merged-counts epilogue
  P5  reuse skip=5 (+ record arrays)
  P6  reuse skip=0 (full, new epilogue)
  P7  full rebuild (build_and_search_fast) with the new epilogue
  P8  P7 at pack=8 (wcap 192 preserved; window DMA /2)
  P9  P7 at pack=16, wcap=256 (window DMA /4, +33% mask rows)
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
from treensearch_tpu.ops.grid import fresh_state, update_grid

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


def timeit(name, loop, *args):
    outs = loop(*args)
    jax.block_until_ready(outs)
    acc = int(np.asarray(outs[-1]))
    t0 = time.perf_counter()
    outs = loop(*args)
    acc = int(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step (acc={acc})")
    return outs


# warmed carry fixture
carry_w = None


def make_carry():
    global carry_w
    if carry_w is None:
        @jax.jit
        def _mk(points, st):
            st = update_grid(st, points, jnp.float32(cell))
            return fp._pallas_prep(points, None, st, cfg, knobs0), st
        carry_w, _ = _mk(pts_dev, fresh_state())
        jax.block_until_ready(carry_w)
    return carry_w


# ---- P0: baseline loop ---------------------------------------------------
@jax.jit
def p0(points, st0):
    def body(i, c):
        st, acc = c
        st = update_grid(st, points, jnp.float32(cell))
        lin, _, _, _ = fp._padded_lin(points, st, cfg, knobs0)
        return st, acc + jnp.sum(lin[::4096], dtype=jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))


timeit("P0 base", p0, pts_dev, fresh_state())

carry0 = make_carry()


# ---- P1: + key check -----------------------------------------------------
@jax.jit
def p1(points, st0, carry):
    def body(i, c):
        st, acc = c
        st = update_grid(st, points, jnp.float32(cell))
        lin, _, _, _ = fp._padded_lin(points, st, cfg, knobs0)
        same = jnp.all(lin[carry.idx_s] == carry.lin_s)
        return st, acc + same.astype(jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))


timeit("P1 +check", p1, pts_dev, fresh_state(), carry0)


# ---- P2: + cond (reuse branch taken) -------------------------------------
@jax.jit
def p2(points, st0, carry):
    def body(i, c):
        st, carry, acc = c
        st = update_grid(st, points, jnp.float32(cell))
        lin, _, _, _ = fp._padded_lin(points, st, cfg, knobs0)
        same = jnp.all(lin[carry.idx_s] == carry.lin_s)
        carry = jax.lax.cond(
            same,
            lambda: carry._replace(valid=jnp.ones((), jnp.bool_)),
            lambda: fp._pallas_prep(points, None, st, cfg, knobs0))
        carry = jax.lax.optimization_barrier(carry)
        return st, carry, acc + carry.qpos[0] + carry.desc[0, 0]
    st, carry, acc = jax.lax.fori_loop(0, ITERS, body,
                                       (st0, carry, jnp.int32(0)))
    return st, acc


timeit("P2 +cond", p2, pts_dev, fresh_state(), carry0)


# ---- P3: prep every step, straight-line ----------------------------------
@jax.jit
def p3(points, st0):
    def body(i, c):
        st, acc = c
        st = update_grid(st, points, jnp.float32(cell))
        carry = fp._pallas_prep(points, None, st, cfg, knobs0)
        carry = jax.lax.optimization_barrier(carry)
        return st, acc + carry.qpos[0] + carry.desc[0, 0]
    return jax.lax.fori_loop(0, ITERS, body, (st0, jnp.int32(0)))


timeit("P3 prep-every-step", p3, pts_dev, fresh_state())


# ---- P4-P7: step-fn ladders ----------------------------------------------
def step_loop(knobs, cfg_x, reuse=True):
    if reuse:
        def estep(st, carry, points):
            return fp.build_and_search_fast_carry_jit(
                points, None, jnp.float32(R), jnp.float32(cell),
                st, carry, cfg_x, knobs)
    else:
        def estep(st, carry, points):
            sol, st = fp.build_and_search_fast_jit(
                points, None, jnp.float32(R), jnp.float32(cell),
                st, cfg_x, knobs)
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
        ("P4 reuse skip6", dict(skip_stage=6), True),
        ("P5 reuse skip5", dict(skip_stage=5), True),
        ("P6 reuse full", dict(), True),
        ("P7 rebuild full", dict(), False),
        ("P8 rebuild pack8", dict(pack=8), False),
        ("P9 rebuild pack16 w256", dict(pack=16, wcap=256), False)):
    knobs = knobs0._replace(**kn)
    carry_x = fp.make_fast_carry0(cfg, knobs)
    loop = step_loop(knobs, cfg, reuse)
    st, carry_x, acc = loop(pts_dev, fresh_state(), carry_x)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, carry_x, acc = loop(pts_dev, st, carry_x)
    int(np.asarray(acc))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/step ({total / dt * 1e3:.3e} pairs/s)")
