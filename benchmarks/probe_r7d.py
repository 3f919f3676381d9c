"""Records-build micro-probe: where do the 16.7 ms (probe_r7a S5-S6) go?

Hypotheses tested on hardware, all at the 1M layout (NPAD ~ 1.25M slots):
  G8   (NPAD, 8) int32 row gather               (the current build)
  G8T  + .T                                      (adds the q_t transpose)
  G8R  + reshape to (NPAD/16, 128)               (adds the rec_pad relayout)
  G4   (NPAD, 4) row gather                      (half-width records)
  G1   (NPAD,) 1D gather                         (element-rate reference)
  GS   (NPAD/16, 128) packed-row gather x2 + log-rolls (phase-aligned
       2-row scheme: gather sorted packed rows instead of points)
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

N = int(os.environ.get("N", 1_000_000))
NPAD = int(os.environ.get("NPAD", 1_250_048))
ITERS = int(os.environ.get("ITERS", 20))


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


rng = np.random.default_rng(0)
opad = jnp.asarray(rng.integers(0, N, NPAD).astype(np.int32))
rec8 = jnp.asarray(rng.integers(0, 1 << 30, (N + 1, 8)).astype(np.int32))
rec4 = rec8[:, :4]
rec1 = rec8[:, 0]
recp = jnp.asarray(
    rng.integers(0, 1 << 30, (NPAD // 16 + 64, 128)).astype(np.int32))
rows_idx = jnp.asarray(rng.integers(0, NPAD // 16, NPAD // 16)
                       .astype(np.int32))
phase = jnp.asarray(rng.integers(0, 16, NPAD // 16).astype(np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    stamp(f"{name}: {dt:.2f} ms")


def bar(x):
    return jax.lax.optimization_barrier(x)


timeit("G8  (NPAD,8) row gather", lambda o, r: bar(r[o]), opad, rec8)
timeit("G8T + transpose", lambda o, r: bar(bar(r[o]).T), opad, rec8)
timeit("G8R + reshape(-1,128)",
       lambda o, r: bar(bar(r[o]).reshape(-1, 128)), opad, rec8)
timeit("G8TR both (current records)",
       lambda o, r: (lambda g: (bar(g.T), bar(g.reshape(-1, 128))))(
           bar(r[o])), opad, rec8)
timeit("G4  (NPAD,4) row gather", lambda o, r: bar(r[o]), opad, rec4)
timeit("G1  (NPAD,) 1D gather", lambda o, r: bar(r[o]), opad, rec1)


def gs(ri, ph, r):
    lo = r[ri]
    hi = r[jnp.minimum(ri + 1, r.shape[0] - 1)]
    out = lo
    for b, s in ((1, 8), (2, 16), (4, 32), (8, 64)):
        sel = ((ph & b) != 0)[:, None]
        out = jnp.where(sel, jnp.concatenate(
            [out[:, s:], hi[:, :s]], axis=1), out)
        hi = jnp.where(sel, jnp.concatenate(
            [hi[:, s:], lo[:, :s]], axis=1), hi)  # rough stand-in cost
    return bar(out)


timeit("GS  2-row gather + log lane shifts", gs, rows_idx, phase, recp)
