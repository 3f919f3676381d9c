"""Stage-by-stage device timing of the fast path (in-graph loops)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.grid import fresh_state, update_grid
from treensearch_tpu.ops import fastpath as F
from treensearch_tpu.utils import keys as K
from treensearch_tpu.utils.compact import compact_rows

N = int(os.environ.get("N", 131072))
R = float(os.environ.get("R", 0.04))
TILE = int(os.environ.get("TILE", 128))
GROUP = int(os.environ.get("GROUP", 8))
WCAP = int(os.environ.get("WCAP", 512))
DENSE = int(os.environ.get("DENSE", 1 << 19))
REPS = 10

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
cell = 1.5 * R
cfg = SearchConfig((N,), ((0, 0),), False, False, 1, 1024, 512, 80)
knobs = F.FastKnobs(tile=TILE, group=GROUP, wcap=WCAP, dense_cap=DENSE)


def timed(name, fn):
    """fn: (points, salt) -> scalar; loops REPS in-graph with data dep."""
    @jax.jit
    def loop(p):
        def body(i, acc):
            return acc + fn(p + acc * 1e-12, i)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    r = loop(pts)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    val = float(loop(pts))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


state0 = update_grid(fresh_state(), pts, jnp.float32(cell))
w = 1


def build_structure(p):
    state = update_grid(fresh_state(), p, jnp.float32(cell))
    kx, ky, kz = state.n_cells[0], state.n_cells[1], state.n_cells[2]
    dy, dz = ky + 2 * w, kz + 2 * w
    inv = 1.0 / state.cell_size
    ijk = K.quantize(p, state.grid_min, inv, state.n_cells)
    lin = jnp.minimum(F._lin_coords(ijk, w, dy, dz), knobs.dense_cap - 1)
    iota = jnp.arange(N, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    return state, lin_s, idx_s, dy, dz


# 1. sort only
timed("sort", lambda p, i: build_structure(p)[1][0].astype(jnp.float32))

# 2. + gathers of sorted fields
def stage_gather(p, i):
    state, lin_s, idx_s, dy, dz = build_structure(p)
    pts_s = p[idx_s]
    return pts_s[0, 0]
timed("sort+gather", stage_gather)

# 3. + dense table (histogram + blocked cumsum, as in fastpath)
def stage_table(p, i):
    state, lin_s, idx_s, dy, dz = build_structure(p)
    cap = knobs.dense_cap
    hist = jnp.zeros((cap + 1,), jnp.int32).at[lin_s + 1].add(1)
    blk = 1 << max(1, ((cap + 1).bit_length() // 2))
    pad_len = (-(cap + 1)) % blk
    h2 = jnp.pad(hist, (0, pad_len)).reshape(blk, -1)
    within = jnp.cumsum(h2, axis=1)
    row_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(within[:, -1])[:-1]])
    table = (within + row_off[:, None]).reshape(-1)[: cap + 1]
    return table[-1].astype(jnp.float32)
timed("sort+table", stage_table)

# 4. full without emission (counts only: skip compact_rows)
import treensearch_tpu.ops.fastpath as fp
orig_compact = fp.compact_rows
def no_compact(mask, values, out_w, fill=-1):
    return jnp.zeros((mask.shape[0], out_w), jnp.int32)
def stage_nocompact(p, i):
    fp.compact_rows = no_compact
    try:
        sol, _ = F.build_and_search_fast(p, None, jnp.float32(R),
                                         jnp.float32(cell), fresh_state(),
                                         cfg, knobs)
    finally:
        fp.compact_rows = orig_compact
    return sol["pairs"]["0-0"]["counts"][0].astype(jnp.float32)
timed("full-no-emission", stage_nocompact)

# 5. full
def stage_full(p, i):
    sol, _ = F.build_and_search_fast(p, None, jnp.float32(R),
                                     jnp.float32(cell), fresh_state(), cfg,
                                     knobs)
    return (sol["pairs"]["0-0"]["counts"][0]
            + jnp.sum(sol["pairs"]["0-0"]["nbrs"], dtype=jnp.int32)
            ).astype(jnp.float32)
timed("full", stage_full)
