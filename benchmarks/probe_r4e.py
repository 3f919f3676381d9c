"""Unpacked-window mask path A/B at 1M: one lanes->sublanes reshape per
window (all slots on sublane rows, fields at lanes 0..7) vs the per-phase
lane-extract loop, across record packs.

Why it could win: at pack=16 the window DMA moves the minimum bytes
(32 B/point) but the phase loop pays 16 extract rounds per field — the
measured pack sweep (4 > 8 > 16 at 1M, benchmarks/NOTES.md) is believed
to be extraction-bound, not DMA-bound.  If the single reshape relayout is
cheaper than (pack-1) extract rounds, the optimal pack moves up and DMA
bytes drop with it.  Whether Mosaic lowers the (wrows, 128) -> (wcap,
128/pack) reshape to something cheap is exactly what this measures.

Run combinations also cross rec_wide (the wide record gather, probe_r4c).
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
eng.run()
eng.run()
stamp(f"settled: pack={eng._pack} dense={eng._dense_cap} "
      f"tiles={eng._tiles_cap} wcap={eng._wcap} "
      f"pre=({eng._pre_cap},{eng._pre_edge})")

pts_dev = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
state = eng._grid_state
TOTAL = None


def loop_ms(knobs, label):
    global TOTAL

    @jax.jit
    def loop(points, st):
        def body(_, carry):
            st, acc, flg = carry
            sol, st = fp.build_and_search_fast_jit(
                points, None, jnp.float32(R), jnp.float32(cell), st,
                cfg, knobs)
            acc = acc + jnp.sum(sol["pairs"]["0-0"]["counts"],
                                dtype=jnp.int32)
            flg = flg + sol["cand_max"] + sol["tile_overflow"] \
                + sol["rows_overflow"] \
                + jnp.maximum(sol["pre_surv_max"] - knobs.pre_cap, 0) \
                + jnp.maximum(sol["pre_surv_edge_max"] - knobs.pre_edge, 0)
            return st, acc, flg
        return jax.lax.fori_loop(0, ITERS, body,
                                 (st, jnp.int32(0), jnp.int32(0)))

    st, acc, flg = loop(pts_dev, fresh_state())
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, acc, flg = loop(pts_dev, fresh_state())
    acc, flg = int(acc), int(flg)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    ok = "OK" if (TOTAL is None or acc == TOTAL) else "MISMATCH"
    stamp(f"{label}: {dt:.1f} ms/step (acc={acc} {ok} flags={flg})")
    if TOTAL is None:
        TOTAL = acc
    return dt


base = eng._knobs(True)
loop_ms(base, f"baseline pack={base.pack} wcap={base.wcap}")
for pk in (4, 8, 16):
    wc = -(-base.wcap // (8 * pk)) * (8 * pk)
    loop_ms(base._replace(pack=pk, wcap=wc), f"pack={pk} unpack=0")
    loop_ms(base._replace(pack=pk, wcap=wc, unpack_win=True),
            f"pack={pk} unpack=1")
    loop_ms(base._replace(pack=pk, wcap=wc, unpack_win=True, rec_wide=True),
            f"pack={pk} unpack=1 rec_wide=1")
stamp("unpack sweep done")
