"""Stage breakdown of the v3 cell-run-tile fast path at 1M points (TPU).

Times cumulative prefixes of the pipeline as separate jitted programs in
fori_loops (the axon tunnel adds ~40 ms/dispatch; loops amortize it).
A tiny per-iteration perturbation of the input keeps XLA from hoisting
loop-invariant work.  Stages:

  A  quantize + linear key + sort + sorted gathers
  B  A + dense table + row pads + padded layout + tile stats + descriptors
  C  B + record/query array construction (scatter + pad + transpose)
  full  the engine step (bench.py path)
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
from treensearch_tpu.ops.fastpath import (FastKnobs, _blocked_cumsum,
                                          _lin_coords, default_tiles_cap)
from treensearch_tpu.ops.grid import fresh_state, update_grid
from treensearch_tpu.utils import keys as K

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
CELLF = float(os.environ.get("CELLF", 1.5))
ITERS = int(os.environ.get("ITERS", 10))
WCAP = int(os.environ.get("WCAP", 288))
DENSE = int(os.environ.get("DENSE", 1 << 19))
PTILE = 128
W = 1
PACK = int(os.environ.get("PACK", 4))

rng = np.random.default_rng(0)
pts_np = rng.uniform(0, 1, (N, 3)).astype(np.float32)


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[-1])  # warm + sync
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[-1])  # host fetch
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/iter")
    return dt


state0 = update_grid(fresh_state(), jnp.asarray(pts_np), jnp.float32(CELLF * R))
tiles_cap = default_tiles_cap(N)
NPAD = tiles_cap * PTILE


def prep(points, upto):
    st = update_grid(fresh_state(), points, jnp.float32(CELLF * R))
    kx, ky, kz = st.n_cells[0], st.n_cells[1], st.n_cells[2]
    dy, dz = ky + 2 * W, kz + 2 * W
    inv_cell = 1.0 / st.cell_size
    ijk = K.quantize(points, st.grid_min, inv_cell, st.n_cells)
    lin = jnp.minimum(_lin_coords(ijk, W, dy, dz), DENSE - 1)
    iota = jnp.arange(N, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    pts_s = points[idx_s]
    if upto == "A":
        return lin_s[::4096].sum() + pts_s[::4096].sum()

    hist = jnp.zeros((DENSE + 1,), jnp.int32).at[lin + 1].add(1)
    table = _blocked_cumsum(hist)
    if upto == "T":
        return table[::4096].sum() + pts_s[0, 0]
    rid = lin_s // dz
    r_idx = jnp.arange(DENSE + 1, dtype=jnp.int32)
    r_eff = jnp.minimum(r_idx, DENSE // dz + 1)
    row_starts = table[jnp.minimum(r_eff * dz, DENSE)]
    row_pads = (-(row_starts[1:] - row_starts[:-1])) % PTILE
    pads_inc = _blocked_cumsum(row_pads)
    pads_exc = pads_inc - row_pads
    pp = jnp.minimum(iota + pads_exc[rid], NPAD - 1)
    if upto == "P":
        return pp[::4096].sum() + pts_s[0, 0]
    tile_of = pp // PTILE
    lmin = jnp.full((tiles_cap,), np.iinfo(np.int32).max,
                    jnp.int32).at[tile_of].min(lin_s)
    lmax = jnp.full((tiles_cap,), -1, jnp.int32).at[tile_of].max(lin_s)
    has = (lmax >= 0).astype(jnp.int32)
    trow = jnp.where(has > 0, lmin // dz, 0)
    k0 = lmin - trow * dz
    k1 = jnp.maximum(lmax - trow * dz, 0)
    starts_l, lens_l = [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            rp = jnp.clip(trow + di * dy + dj, 0, DENSE // dz)
            base = jnp.minimum(rp * dz, DENSE)
            s = table[jnp.clip(base + k0 - W, 0, DENSE)]
            e = table[jnp.clip(base + k1 + W + 1, 0, DENSE)]
            lens_l.append(jnp.maximum(e - s, 0) * has)
            starts_l.append(jnp.clip(s + pads_exc[rp], 0, NPAD))
    starts = jnp.stack(starts_l, 1)
    lens = jnp.stack(lens_l, 1)
    if upto == "B":
        return starts[::64].sum() + lens[::64].sum() + jnp.max(lens)

    rec8 = jnp.stack([pts_s[:, 0], pts_s[:, 1], pts_s[:, 2],
                      jnp.zeros((N,), jnp.float32),
                      jax.lax.bitcast_convert_type(idx_s, jnp.float32),
                      jnp.zeros((N,), jnp.float32),
                      jnp.zeros((N,), jnp.float32),
                      jnp.zeros((N,), jnp.float32)], axis=1)
    sent = jnp.zeros((8,), jnp.float32).at[0].set(1e18)
    rec8_pad = jnp.broadcast_to(sent, (NPAD + 1024, 8)).at[pp].set(rec8)
    q_t = rec8_pad[:NPAD + PTILE].T
    lpp = 128 // PACK
    rec_pad = jnp.pad(rec8_pad, ((0, 0), (0, lpp - 8))).reshape(-1, 128)
    return q_t[:, ::4096].sum() + rec_pad[::4096, 0].sum() + starts[0, 0]


def loop(upto):
    @jax.jit
    def f(points):
        def body(i, acc):
            return acc + prep(points + i * 1e-9, upto)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return f


pts_dev = jnp.asarray(pts_np)
stamp(f"stage timings, N={N} wcap={WCAP} cellf={CELLF} dense={DENSE} "
      f"pack={PACK}")
tA = timed("A sort+gather", loop("A"), pts_dev)
tT = timed("T +hist+table", loop("T"), pts_dev)
tP = timed("P +rowpads+pp", loop("P"), pts_dev)
tB = timed("B +tilestats+desc", loop("B"), pts_dev)
tC = timed("C +records", loop("C"), pts_dev)

# window-length histogram (what wcap should be)
st = update_grid(fresh_state(), pts_dev, jnp.float32(CELLF * R))
out = jax.jit(lambda p: prep(p, "B"))(pts_dev)  # warm

# measure the full engine step at this WCAP
eng = TreeNSearch()
eng.add_point_set(pts_np)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.set_cell_size(CELLF * R)
eng._wcap = WCAP
eng._pack = PACK
eng._dense_cap = DENSE
eng._pre_cap = int(os.environ.get("PRECAP", 48))
eng.run()
stamp(f"engine stats: {eng._last_stats}  wcap={eng._wcap} "
      f"pre={eng._pre_cap} fat=({eng._fat_wcap},{eng._fat_cap})")
step, st0 = eng.make_step_fn()


@jax.jit
def full(points, st):
    def body(i, carry):
        st, acc = carry
        sol, st = step(st, points)
        p = sol["pairs"]["0-0"]
        pass  # counts-only checksum; nbr blocks now live in sol["blocks"]
        return st, acc + jnp.sum(p["counts"][::257], dtype=jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))


tF = timed("full step", full, pts_dev, st0)
stamp(f"kernel+finalize ~= {tF - tC:.1f} ms  (prep C = {tC:.1f})")
