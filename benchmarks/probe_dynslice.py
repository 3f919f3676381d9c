"""Mosaic capability + cost probe: dynamic sublane slice of VMEM scratch.

The hull-DMA kernel idea (round 3; benchmarks/NOTES.md) fetches ONE
contiguous record range per stencil PLANE (or per tile group) and slices
each logical window out of the staged hull at a DYNAMIC sublane offset.
That trades 9 small DMA issues (~0.5 us each, the measured per-window
fixed cost) for 3 bigger ones — but only works if Mosaic can read
``scratch[pl.ds(dyn_off, static_len)]`` efficiently.

This probe measures, on (48, 128) reads repeated R times:
  a) static slice read  (baseline)
  b) dynamic-offset slice read
  c) dynamic pltpu.roll then static read (fallback formulation)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")

H, W, SL = 512, 128, 48
REPS = 64


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def mk(variant):
    def kernel(x_ref, s_ref, o_ref):
        acc = jnp.zeros((SL, W), jnp.int32)
        for r in range(REPS):
            off = s_ref[0, r]
            if variant == "static":
                v = x_ref[(r * 13) % (H - SL):(r * 13) % (H - SL) + SL, :]
            elif variant == "dyn":
                v = x_ref[pl.ds(off, SL), :]
            elif variant == "roll":
                v = pltpu.roll(x_ref[:, :], -off, 0)[:SL, :]
            acc = acc + v
        o_ref[:, :] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((H, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, REPS), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((SL, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SL, W), jnp.int32),
        grid=(2048,))


x = jnp.asarray(np.random.default_rng(0).integers(
    0, 100, (H, W)).astype(np.int32))
offs = jnp.asarray((np.arange(REPS) * 13 % (H - SL))
                   .astype(np.int32).reshape(1, REPS))

for variant in ("static", "dyn", "roll"):
    try:
        f = mk(variant)
        out = f(x, offs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(x, offs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        per = dt * 1e6 / (2048 * REPS)
        stamp(f"{variant:7s}: {dt:7.2f} ms for 2048x{REPS} reads "
              f"({per:.3f} us/read of ({SL},{W}))")
    except Exception as e:
        stamp(f"{variant:7s}: FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:150]}")
