"""Knob sweep for the v3 kernel at 1M: wcap x pre_cap x pack.

Also prints the per-tile max-window-length quantiles (what wcap should
be, and how many tiles each wcap sends to the fat tier).
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
# combo: wcap,pre_cap,pack,cell_factor (cell = factor * R)
COMBOS = os.environ.get(
    "COMBOS", "288,48,4,1.5 192,48,1,1.0 192,48,4,1.0 160,48,4,1.0")

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
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
stamp(f"settled: {eng._last_stats} wcap={eng._wcap} total={total}")

# window-length quantiles from a throwaway big-wcap run's descriptors:
# recompute lens XLA-side (cheap) via the engine internals
from treensearch_tpu.ops.fastpath import (FastKnobs, _blocked_cumsum,
                                          _lin_coords, default_tiles_cap)
from treensearch_tpu.ops.grid import fresh_state, update_grid
from treensearch_tpu.utils import keys as K

W = 1
DENSE = eng._dense_cap
tiles_cap = eng._tiles_cap
PTILE = 128


@jax.jit
def lens_of(points):
    st = update_grid(fresh_state(), points, jnp.float32(1.5 * R))
    dy, dz = st.n_cells[1] + 2 * W, st.n_cells[2] + 2 * W
    inv_cell = 1.0 / st.cell_size
    ijk = K.quantize(points, st.grid_min, inv_cell, st.n_cells)
    lin = jnp.minimum(_lin_coords(ijk, W, dy, dz), DENSE - 1)
    iota = jnp.arange(N, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    hist = jnp.zeros((DENSE + 1,), jnp.int32).at[lin + 1].add(1)
    table = _blocked_cumsum(hist)
    rid = lin_s // dz
    kq = lin_s - rid * dz
    r_idx = jnp.arange(DENSE + 1, dtype=jnp.int32)
    r_eff = jnp.minimum(r_idx, DENSE // dz + 1)
    row_starts = table[jnp.minimum(r_eff * dz, DENSE)]
    row_pads = (-(row_starts[1:] - row_starts[:-1])) % PTILE
    pads_inc = _blocked_cumsum(row_pads)
    pads_exc = pads_inc - row_pads
    pp = jnp.minimum(iota + pads_exc[rid], tiles_cap * PTILE - 1)
    tile_of = pp // PTILE
    k0 = jnp.full((tiles_cap,), 1 << 30, jnp.int32).at[tile_of].min(kq)
    k1 = jnp.zeros((tiles_cap,), jnp.int32).at[tile_of].max(kq)
    trow = jnp.zeros((tiles_cap,), jnp.int32).at[tile_of].max(rid)
    has = jnp.zeros((tiles_cap,), jnp.int32).at[tile_of].max(
        jnp.ones((N,), jnp.int32))
    mx = jnp.zeros((tiles_cap,), jnp.int32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            rp = jnp.clip(trow + di * dy + dj, 0, DENSE // dz)
            base = jnp.minimum(rp * dz, DENSE)
            s = table[jnp.clip(base + k0 - W, 0, DENSE)]
            e = table[jnp.clip(base + k1 + W + 1, 0, DENSE)]
            mx = jnp.maximum(mx, jnp.maximum(e - s, 0) * has)
    return mx, jnp.sum(has)


mx, n_tiles = lens_of(jnp.asarray(pts_np))
mx = np.asarray(mx)
n_tiles = int(n_tiles)
occ = mx[mx > 0]
qs = np.percentile(occ, [50, 75, 90, 95, 99, 99.9, 100])
stamp(f"tiles={n_tiles} max-window quantiles 50/75/90/95/99/99.9/100: "
      f"{qs.astype(int).tolist()}")
for cap in (160, 192, 224, 256, 288):
    stamp(f"  wcap={cap}: fat tiles = {(occ > cap).sum()} "
          f"({100.0 * (occ > cap).sum() / len(occ):.2f}%)")

pts_dev = jnp.asarray(pts_np)
for combo in COMBOS.split():
    parts = combo.split(",")
    wcap, pre, pack = int(parts[0]), int(parts[1]), int(parts[2])
    cellf = float(parts[3]) if len(parts) > 3 else 1.5
    eng.set_cell_size(cellf * R)
    eng._wcap, eng._pre_cap, eng._pack = wcap, pre, pack
    eng._dense_cap = None
    eng._tiles_cap = None
    try:
        eng.run()  # settle fat caps for this combo; verifies exactness path
    except Exception as e:
        stamp(f"wcap={wcap} pre={pre} pack={pack} cell={cellf}r: "
              f"FAILED {type(e).__name__} {str(e)[:200]}")
        continue
    c = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
    if c != total:
        stamp(f"wcap={wcap} pre={pre} pack={pack} cell={cellf}r: "
              f"PAIR MISMATCH {c} != {total}")
        continue
    step, st0 = eng.make_step_fn()

    @jax.jit
    def loop(points, st):
        def body(i, carry):
            st, acc = carry
            sol, st = step(st, points)
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
    stamp(f"wcap={wcap} pre={pre} pack={pack} cell={cellf}r: {dt:.1f} "
          f"ms/step ({total / dt * 1e3 / 1e8:.2f}e8 pairs/s) pairs={c} "
          f"fat=({eng._fat_wcap},{eng._fat_cap}) tiles={eng._tiles_cap}")
