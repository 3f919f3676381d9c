"""Throughput of Mosaic primitives used by the pair kernel."""
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


T, M = 128, 512
GRID = 2048  # tiles; total elems = GRID*T*M = 134M


def bench_kernel(name, body, n_ops_per_elem, reps=5):
    def kernel(x_ref, o_ref):
        o_ref[:] = body(x_ref[:])

    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((T, M), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, M), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * T, M), jnp.int32),
    )
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, (GRID * T, M)).astype(np.int32))

    @jax.jit
    def loop(x):
        def it(i, acc):
            return acc + f(x + acc)[0, 0]
        return jax.lax.fori_loop(0, reps, it, jnp.int32(0))

    v = int(loop(x))
    t0 = time.perf_counter()
    v = int(loop(x))
    dt = (time.perf_counter() - t0) / reps
    elems = GRID * T * M
    stamp(f"{name}: {dt*1e3:.1f} ms -> {elems*n_ops_per_elem/dt/1e12:.2f} "
          f"Tops/s ({elems/dt/1e9:.1f} Gelem/s)")


# 1. 16 chained adds (pure VPU arithmetic)
def adds(x):
    for _ in range(16):
        x = x + 1
    return x
bench_kernel("adds x16", adds, 16)

# 2. 16 lane rolls
def rolls(x):
    for i in range(16):
        x = pltpu.roll(x, 1 + i, 1)
    return x
bench_kernel("lane-roll x16", rolls, 16)

# 3. 16 sublane rolls
def subrolls(x):
    for i in range(16):
        x = pltpu.roll(x, 1 + i, 0)
    return x
bench_kernel("sublane-roll x16", subrolls, 16)

# 4. 8 where-select chains
def wheres(x):
    for i in range(8):
        x = jnp.where(x > i, x, x + 1)
    return x
bench_kernel("where x8", wheres, 16)

# 5. take_along_axis (dynamic lane gather), 8 rounds
def gathers(x):
    idx = (x & (M - 1))
    y = x
    for _ in range(8):
        y = jnp.take_along_axis(y, idx, axis=1)
    return y
bench_kernel("take_along x8", gathers, 8)
