"""Micro-probe: cost of candidate/query record construction variants at 1M.

C1: current  — sentinel-broadcast (NPAD,8) + row scatter at pp + .T +
               lane-pad to lpp + reshape
C2: unpadded — rec from contiguous concat (no scatter) + q_t via row
               scatter + transpose
C3: unpadded rec + q_t via 8 separate 1-D scatters (no transpose)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 1_000_000))
ITERS = 10
PACK = 4
LPP = 128 // PACK
NPAD = 1_280_000
SLACK = 1024

rng = np.random.default_rng(0)
pts_s = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
idx_s = jnp.arange(N, dtype=jnp.int32)
pp = jnp.sort(jnp.asarray(
    rng.choice(NPAD, size=N, replace=False).astype(np.int32)))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(name, fn, *args):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[-1])
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[-1])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.1f} ms/iter")


def rec8_of(pts):
    z = jnp.zeros((N,), jnp.float32)
    return jnp.stack([pts[:, 0], pts[:, 1], pts[:, 2], z,
                      jax.lax.bitcast_convert_type(idx_s, jnp.float32),
                      z, z, z], axis=1)


sent = jnp.zeros((8,), jnp.float32).at[0].set(1e18)


def c1(pts):
    rec8 = rec8_of(pts)
    rec8_pad = jnp.broadcast_to(sent, (NPAD + SLACK, 8)).at[pp].set(rec8)
    q_t = rec8_pad[:NPAD + 128].T
    rec_pad = jnp.pad(rec8_pad, ((0, 0), (0, LPP - 8))).reshape(-1, 128)
    return q_t[:, ::4096].sum() + rec_pad[::4096, 0].sum()


def c2(pts):
    rec8 = rec8_of(pts)
    tail = jnp.broadcast_to(sent, (SLACK, 8))
    rec_pad = jnp.pad(jnp.concatenate([rec8, tail]),
                      ((0, 0), (0, LPP - 8))).reshape(-1, 128)
    q8 = jnp.broadcast_to(sent, (NPAD + 128, 8)).at[pp].set(rec8)
    q_t = q8.T
    return q_t[:, ::4096].sum() + rec_pad[::4096, 0].sum()


def c4(pts):
    rec8 = rec8_of(pts)
    tail = jnp.broadcast_to(sent, (SLACK, 8))
    rec_pad = jnp.pad(jnp.concatenate([rec8, tail]),
                      ((0, 0), (0, LPP - 8))).reshape(-1, 128)
    return rec_pad[::4096, 0].sum()


def c5(pts):
    rec8 = rec8_of(pts)
    q8 = jnp.broadcast_to(sent, (NPAD + 128, 8)).at[pp].set(rec8)
    return q8[::4096, 0].sum()


def c6(pts):
    rec8 = rec8_of(pts)
    gidx = jnp.full((NPAD + 128,), N, jnp.int32).at[pp].set(
        jnp.arange(N, dtype=jnp.int32))
    rec8x = jnp.concatenate([rec8, jnp.broadcast_to(sent, (1, 8))])
    q8 = rec8x[jnp.minimum(gidx, N)]
    return q8[::4096, 0].sum()


def c3(pts):
    rec8 = rec8_of(pts)
    tail = jnp.broadcast_to(sent, (SLACK, 8))
    rec_pad = jnp.pad(jnp.concatenate([rec8, tail]),
                      ((0, 0), (0, LPP - 8))).reshape(-1, 128)
    rows = []
    for c in range(8):
        base = jnp.full((NPAD + 128,), float(sent[c]), jnp.float32)
        rows.append(base.at[pp].set(rec8[:, c]))
    q_t = jnp.stack(rows, axis=0)
    return q_t[:, ::4096].sum() + rec_pad[::4096, 0].sum()


def loop(f):
    @jax.jit
    def g(pts):
        def body(i, acc):
            return acc + f(pts + i * 1e-9)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return g


timed("C4 rec only (concat+pad+reshape)", loop(c4), pts_s)
timed("C5 rec + q8 row-scatter (no T)", loop(c5), pts_s)
timed("C6 rec + q8 via idx-scatter+row-gather", loop(c6), pts_s)
timed("C2 full (rec + scatter + T)", loop(c2), pts_s)
