"""Non-kernel floor decomposition at 1M: sort cost, table/layout cost,
and record-build variants.

The round-3 S-ladder (probe_r4a) puts the XLA floor at ~37 ms and the
record arrays at ~23 ms.  This probe isolates WHERE inside those terms
the time goes, and A/Bs a cheaper record build:

  A (current): rec8 (n,8) -> row gather recp8 (NPAD,8) -> barrier ->
     transpose q_t + pad-to-32 + reshape rec_pad (NPAD/4,128)
  B (rec32):   rec32 (n+1,32) built once -> ONE row gather with output
     shape (NPAD,32) -> reshape is still a relayout, but the gather rows
     are 128 B instead of 32 B (gather engines move bigger rows faster)
     and the pad pass disappears (q_t = slice + transpose of the gather).
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
import treensearch_tpu.utils.keys as K
from treensearch_tpu import TreeNSearch

N = int(os.environ.get("N", 1_000_000))
R = float(os.environ.get("R", 0.02))
ITERS = int(os.environ.get("ITERS", 20))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms")
    return out


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
      f"tiles={eng._tiles_cap} wcap={eng._wcap}")

pts = jnp.asarray(pts_np)
cell = eng._effective_cell_size()
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
knobs = eng._knobs(True)
state = eng._grid_state
st = fp._pallas_statics(cfg, knobs)
NPAD, slack = st["NPAD"], st["slack"]
pack = st["pack"]


# ---- stage ladder inside the XLA floor ---------------------------------
@jax.jit
def s_lin(points):
    lin, dy, dz, _ = fp._padded_lin(points, state, cfg, knobs)
    return lin


@jax.jit
def s_sort(points):
    lin, dy, dz, _ = fp._padded_lin(points, state, cfg, knobs)
    iota = jnp.arange(N, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    return lin_s, idx_s


@jax.jit
def s_table(points):
    lin, dy, dz, _ = fp._padded_lin(points, state, cfg, knobs)
    iota = jnp.arange(N, dtype=jnp.int32)
    lin_s, idx_s = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    hist = jnp.zeros((knobs.dense_cap + 1,), jnp.int32).at[lin + 1].add(1)
    table = fp._blocked_cumsum(hist)
    return lin_s, idx_s, table


@jax.jit
def s_prep(points):
    c = fp._pallas_prep(points, None, state, cfg, knobs)
    return c.lin_s, c.idx_s, c.opad, c.desc, c.qpos


timeit("lin only", s_lin, pts)
timeit("lin+sort", s_sort, pts)
timeit("lin+sort+hist+table", s_table, pts)
timeit("full prep", s_prep, pts)

carry = jax.jit(lambda p: fp._pallas_prep(p, None, state, cfg, knobs))(pts)
carry = jax.block_until_ready(carry)
opad = carry.opad


# ---- record-build variants ---------------------------------------------
def _asbits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


SENT = jax.lax.bitcast_convert_type(jnp.float32(float("nan")), jnp.int32)


@jax.jit
def rec_a(points, opad):
    n = N
    iota = jnp.arange(n, dtype=jnp.int32)
    rec8 = jnp.stack([_asbits(points[:, 0]), _asbits(points[:, 1]),
                      _asbits(points[:, 2]), _asbits(jnp.zeros((n,),
                                                               jnp.float32)),
                      iota, jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32)], axis=1)
    sent = jnp.zeros((8,), jnp.int32).at[0].set(SENT).at[1].set(
        SENT).at[2].set(SENT).at[4].set(n)
    rec8x = jnp.concatenate([rec8, sent[None]])
    recp8 = rec8x[opad]
    recp8 = jax.lax.optimization_barrier(recp8)
    q_t = recp8.T
    rec_pad = jnp.pad(recp8, ((0, 0), (0, 32 - 8))).reshape(-1, 128)
    return q_t, rec_pad


@jax.jit
def rec_b(points, opad):
    n = N
    iota = jnp.arange(n, dtype=jnp.int32)
    rec8 = jnp.stack([_asbits(points[:, 0]), _asbits(points[:, 1]),
                      _asbits(points[:, 2]), _asbits(jnp.zeros((n,),
                                                               jnp.float32)),
                      iota, jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32)], axis=1)
    sent = jnp.zeros((8,), jnp.int32).at[0].set(SENT).at[1].set(
        SENT).at[2].set(SENT).at[4].set(n)
    rec32 = jnp.pad(jnp.concatenate([rec8, sent[None]]),
                    ((0, 0), (0, 32 - 8)))
    recp32 = rec32[opad]
    recp32 = jax.lax.optimization_barrier(recp32)
    q_t = recp32[:, :8].T
    rec_pad = recp32.reshape(-1, 128)
    return q_t, rec_pad


@jax.jit
def rec_b2(points, opad):
    """rec32 gather, q_t from a SECOND narrow gather of rec8 (avoids the
    lane-sliced transpose of the wide gather)."""
    n = N
    iota = jnp.arange(n, dtype=jnp.int32)
    rec8 = jnp.stack([_asbits(points[:, 0]), _asbits(points[:, 1]),
                      _asbits(points[:, 2]), _asbits(jnp.zeros((n,),
                                                               jnp.float32)),
                      iota, jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32),
                      jnp.zeros((n,), jnp.int32)], axis=1)
    sent = jnp.zeros((8,), jnp.int32).at[0].set(SENT).at[1].set(
        SENT).at[2].set(SENT).at[4].set(n)
    rec8x = jnp.concatenate([rec8, sent[None]])
    rec32 = jnp.pad(rec8x, ((0, 0), (0, 32 - 8)))
    recp32 = rec32[opad]
    recp32 = jax.lax.optimization_barrier(recp32)
    rec_pad = recp32.reshape(-1, 128)
    q_t = jax.lax.optimization_barrier(rec8x[opad]).T
    return q_t, rec_pad


qa = timeit("records A (current)", rec_a, pts, opad)
qb = timeit("records B (rec32 gather)", rec_b, pts, opad)
qb2 = timeit("records B2 (rec32 + narrow q_t)", rec_b2, pts, opad)
ok = bool(jnp.array_equal(qa[0], qb[0]) & jnp.array_equal(qa[1], qb[1])
          & jnp.array_equal(qa[0], qb2[0]) & jnp.array_equal(qa[1], qb2[1]))
stamp(f"records parity A==B==B2: {ok}")
