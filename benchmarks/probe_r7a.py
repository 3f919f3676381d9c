"""Round-4 fresh attribution at the 109.4 ms row-tile configuration
(post padding-tile-skip + de-scatter; bench_r7_row_base.out).

Three ladders:
  P*  prep sub-stages by DCE: the checksum consumes selected FastCarry
      fields, so XLA dead-code-eliminates everything downstream of them —
      robust to prep refactors (no stage replication).
  S*  XLA floor with/without records, full step, raw (no per-pair
      epilogue gather) — isolates the 1M counts gather + fat merge.
  L*  kernel rungs (DMA / masks / prefix / merge / full).
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
eng.run()
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: total={total}  knobs: pack={eng._pack} wcap={eng._wcap} "
      f"lb={eng._lane_batch} tps={eng._tps} tiles={eng._tiles_cap}")
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


def prep_rung(name, consume):
    def fn(points, st):
        st = update_grid(st, points, jnp.float32(cell))
        carry = fp._pallas_prep(points, None, st, cfg, knobs0)
        return consume(carry), st
    dt, a = timeloop(fn)
    stamp(f"{name}: {dt:.2f} ms/step (acc={a})")


def cs(x):
    f = x.reshape(-1)
    return jnp.sum(f[::1024][:1024], dtype=jnp.int32)


prep_rung("P1 quantize+sort (lin_s)", lambda c: cs(c.lin_s))
prep_rung("P2 + row layout (pp)", lambda c: cs(c.lin_s) + cs(c.pp))
prep_rung("P3 + opad", lambda c: cs(c.lin_s) + cs(c.pp) + cs(c.opad))
prep_rung("P4 + qpos", lambda c: cs(c.lin_s) + cs(c.pp) + cs(c.opad)
          + cs(c.qpos))
prep_rung("P5 + desc (table+windows)",
          lambda c: cs(c.lin_s) + cs(c.pp) + cs(c.opad) + cs(c.qpos)
          + cs(c.desc))
prep_rung("P6 full prep (+routing/hist)",
          lambda c: cs(c.lin_s) + cs(c.pp) + cs(c.opad) + cs(c.qpos)
          + cs(c.desc) + cs(c.fat_slot) + cs(c.win_hist)
          + c.win_max + c.n_cells_stat)


def step_rung(name, check_total=False, raw=False, **kn):
    knobs = knobs0._replace(**kn)

    def fn(points, st):
        if raw:
            # raw mode keeps the gather record build (needs opad)
            kn_raw = knobs._replace(rec_expand=False)
            st2 = update_grid(st, points, jnp.float32(cell))
            carry = fp._pallas_prep(points, None, st2, cfg, kn_raw)
            sol = fp._pallas_search(points, None, jnp.float32(R), st2,
                                    carry, cfg, kn_raw, raw=True)
            b = sol["blocks"][0]
            return jnp.sum(b["counts_all"][::257], dtype=jnp.int32), st2
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


step_rung("S6 floor, no records (skip6)", skip_stage=6)
step_rung("S5 floor + records (skip5)", skip_stage=5)
step_rung("L0 + pipeline, kernel off", skip_stage=3)
step_rung("L1 + window DMAs", probe_mode=1)
step_rung("L3 + masks", probe_mode=3)
step_rung("L4 + prefix/counts", skip_stage=2)
step_rung("L5 + merge", skip_stage=1)
step_rung("R0 full RAW step (no epilogue)", raw=True)
step_rung("S0 full step", check_total=True)
