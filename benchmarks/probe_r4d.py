"""Kernel-stage split at 1M after the round-3 late trims (compact-network
invalid encoding, staging-fill gating, DMA prefetch), plus a narrow-wcap
sweep around the p95 auto-tune point.

skip_stage semantics (ops/pallas_pairs.py):
  skip=3 : kernels fully predicated off (grid pipeline + output init)
  skip=2 : + DMA + masks + counts (no compact, no merge)
  skip=1 : + merge as well (still no per-window compact)
  skip=0 : full (adds the per-window compact)
so: masks+counts+DMA = S2-S3, merge = S1-S2, compact = S0-S1.
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
stamp(f"settled: pack={eng._pack} dense={eng._dense_cap} "
      f"tiles={eng._tiles_cap} wcap={eng._wcap} "
      f"pre=({eng._pre_cap},{eng._pre_edge})")

pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
state = eng._grid_state


def loop_ms(knobs, label, cfg=cfg, cell_v=None, pts=None):
    cell_v = cell if cell_v is None else cell_v

    @jax.jit
    def loop(points, st):
        def body(_, carry):
            st, acc, flg = carry
            sol, st = fp.build_and_search_fast_jit(
                points, None, jnp.float32(R), jnp.float32(cell_v), st,
                cfg, knobs)
            acc = acc + jnp.sum(sol["pairs"]["0-0"]["counts"][::257],
                                dtype=jnp.int32)
            # a silent overflow (fat tier, pre-caps, tiles) would make the
            # timing meaningless; accumulate the flags into the fetch
            flg = flg + sol["cand_max"] + sol["tile_overflow"] \
                + sol["rows_overflow"] \
                + jnp.maximum(sol["pre_surv_max"] - knobs.pre_cap, 0) \
                + jnp.maximum(sol["pre_surv_edge_max"] - knobs.pre_edge, 0)
            return st, acc, flg
        return jax.lax.fori_loop(0, ITERS, body,
                                 (st, jnp.int32(0), jnp.int32(0)))

    from treensearch_tpu.ops.grid import fresh_state
    pts = pts_dev if pts is None else pts
    st, acc, flg = loop(pts, fresh_state())
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, acc, flg = loop(pts, fresh_state())
    acc, flg = int(acc), int(flg)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{label}: {dt:.1f} ms/step (acc={acc} flags={flg})")
    return dt


base = eng._knobs(True)
for ss, lab in ((3, "S3 pipeline+init"), (2, "S2 +dma+masks+counts"),
                (1, "S1 +merge"), (0, "S0 full (+compact)")):
    loop_ms(base._replace(skip_stage=ss), lab)

# narrow-wcap sweep at the live pre-caps (fat tier absorbs the spill)
for wc in (160, 176, 192, 224):
    loop_ms(base._replace(wcap=wc), f"wcap={wc}")

# record-build schedule A/B in the full step (see probe_r4c for the
# isolated record-stage timings); bit-identical outputs by construction
loop_ms(base._replace(rec_wide=True), "rec_wide=1 (wide gather records)")
# (phase_prefix / packed_carry A/Bs live at the end of probe_r4a.py)


# ---- cell-size sweep -----------------------------------------------------
# At the v4 cell-run kernel the window length is dominated by the tile's
# own 128-slot span, NOT the cell size — but the row padding is: rows of
# ~400 points pad to 512 (28% pad slots -> 28% more tiles) at cell=1.0r,
# while cell~1.25r gives ~625-point rows padding to 640 (2.5%).  All the
# r2/r3 tuning ran at cell=1.0r, inherited from the r1 kernel where the
# per-candidate work scaled with points-per-cell.  Settle each cell size
# through a fresh engine (auto-tunes wcap/pre-caps), then time the
# in-graph step loop.
for mult in (1.15, 1.25, 1.4, 1.5):
    e2 = TreeNSearch()
    e2.add_point_set(pts_np)
    e2.set_search_radius(R)
    e2.set_all_searches(True)
    e2.set_cell_size(mult * R)
    e2.run()
    e2.run()
    c2 = e2._effective_cell_size()
    cfg2 = e2._make_cfg(e2._chunk, e2._stencil_w(c2))
    loop_ms(e2._knobs(True),
            f"cell={mult}r wcap={e2._wcap} tiles={e2._tiles_cap} "
            f"pre=({e2._pre_cap},{e2._pre_edge})",
            cfg=cfg2, cell_v=c2)
