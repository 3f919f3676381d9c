"""Measure the two candidate fixes on real TPU:
1. Pallas DMA window-gather kernel (dynamic slices at HBM bandwidth).
2. compact_rows with static unrolled shifts vs dynamic fori_loop shifts.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def bench_loop(f, *args, reps=10):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + f(i, *a)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    v = float(loop(*args))  # compile + hard sync
    t0 = time.perf_counter()
    v = float(loop(*args))
    return (time.perf_counter() - t0) / reps

N = 1 << 20
N_TILES = 8192
TILE = 128
WCAP = 256
NWIN = 18
F = 8

rng = np.random.default_rng(0)
rec_t = jnp.asarray(rng.uniform(0, 1, (F, N + WCAP)).astype(np.float32))
starts = jnp.asarray(rng.integers(0, N, (N_TILES, NWIN)).astype(np.int32))

# ---- 1. Pallas window-gather kernel: out[t, w] = rec_t[:, s:s+WCAP]
def gather_kernel(starts_ref, rec_ref, out_ref, scratch, sem):
    def body(w, _):
        s = starts_ref[0, w]
        cp = pltpu.make_async_copy(
            rec_ref.at[:, pl.ds(s, WCAP)], scratch.at[w], sem)
        cp.start()
        cp.wait()
        return 0
    jax.lax.fori_loop(0, NWIN, body, 0)
    out_ref[0] = scratch[:]

def run_gather(i, starts, rec_t):
    out = pl.pallas_call(
        gather_kernel,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((1, NWIN), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, NWIN, F, WCAP), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES, NWIN, F, WCAP),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((NWIN, F, WCAP), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )((starts + i) % N, rec_t)
    return out[0, 0, 0, 0]

try:
    dt = bench_loop(run_gather, starts, rec_t)
    gb = N_TILES * NWIN * F * WCAP * 4 / 1e9
    stamp(f"pallas window-gather: {dt*1e3:.1f} ms ({gb:.2f} GB out, "
          f"{gb/dt:.0f} GB/s)")
except Exception as e:
    stamp(f"pallas window-gather FAILED: {type(e).__name__}: {str(e)[:300]}")

# ---- 2. XLA same thing via vmapped dynamic_slice (current fastpath style)
def xla_gather(i, starts, rec_t):
    def tile(srow):
        def win(s):
            return jax.lax.dynamic_slice(rec_t, (0, s), (F, WCAP))
        return jax.vmap(win)(srow)
    out = jax.lax.map(lambda sr: jax.vmap(tile)(sr),
                      ((starts + i) % N).reshape(1024, 8, NWIN))
    return out[0, 0, 0, 0, 0]

dt = bench_loop(xla_gather, starts, rec_t)
stamp(f"xla vmapped dyn-slice gather: {dt*1e3:.1f} ms")

# ---- 3. compaction variants on (8192*?, M)
from treensearch_tpu.utils.compact import compact_rows
M = 4608
R = 1024  # rows per map step; loop 8 steps in-graph to reach 8192 rows
mask0 = jnp.asarray(rng.uniform(size=(R, M)) < 0.01)
vals0 = jnp.asarray(rng.integers(0, N, (R, M)).astype(np.int32))

def compact_dyn(i, mask, vals):
    out = compact_rows(jnp.roll(mask, i, 0), vals, 64)
    return jnp.sum(out, dtype=jnp.int32).astype(jnp.float32)

dt = bench_loop(compact_dyn, mask0, vals0)
stamp(f"compact dyn-shift ({R}x{M}->64): {dt*1e3:.1f} ms "
      f"(x{(1<<20)//R} for 1M rows: {dt*1e3*(1<<20)/R:.0f} ms)")

def compact_static(mask, values, out_w, fill=-1):
    r, m = mask.shape
    lane = jnp.arange(m, dtype=jnp.int32)[None, :]
    p = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    keep = mask & (p <= out_w)
    d = jnp.where(keep, lane - (p - 1), 0)
    v = jnp.where(keep, values, fill)
    valid = keep
    s = 1
    while s < m:
        in_v = jnp.roll(v, -s, axis=1)
        in_d = jnp.roll(d, -s, axis=1)
        in_valid = jnp.roll(valid, -s, axis=1) & (lane < m - s)
        take = in_valid & ((in_d & s) != 0)
        stay = valid & ((d & s) == 0)
        v = jnp.where(take, in_v, jnp.where(stay, v, fill))
        d = jnp.where(take, in_d - s, jnp.where(stay, d, 0))
        valid = take | stay
        s <<= 1
    return v[:, :out_w]

def compact_stat(i, mask, vals):
    out = compact_static(jnp.roll(mask, i, 0), vals, 64)
    return jnp.sum(out, dtype=jnp.int32).astype(jnp.float32)

stamp("compiling static-shift compaction (may be slow)...")
dt = bench_loop(compact_stat, mask0, vals0)
stamp(f"compact static-shift ({R}x{M}->64): {dt*1e3:.1f} ms "
      f"(x{(1<<20)//R} for 1M rows: {dt*1e3*(1<<20)/R:.0f} ms)")
