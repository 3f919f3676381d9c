import time, sys, os
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def trial(name, fn):
    try:
        r = fn()
        jax.block_until_ready(r)
        print(f"{name}: OK {np.asarray(r).ravel()[:3]}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

rng = np.random.default_rng(0)

# A. in-kernel transpose (128, 384) int32
def t_transpose():
    x = jnp.asarray(rng.integers(0, 99, (128, 384)).astype(np.int32))
    def k(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((384, 128), jnp.int32))(x)
trial("transpose 128x384 i32", t_transpose)

# B. DMA row-range of (N, 8) HBM -> (wpad, 8) VMEM scratch
def t_dma_rows8():
    N, wpad = 4096, 264
    rec = jnp.asarray(rng.uniform(size=(N + wpad, 8)).astype(np.float32))
    start = jnp.asarray([[16]], dtype=jnp.int32)
    def k(s_ref, rec_ref, o_ref, scr, sem):
        st = pl.multiple_of((s_ref[0, 0] // 8) * 8, 8)
        cp = pltpu.make_async_copy(rec_ref.at[pl.ds(st, wpad)], scr, sem)
        cp.start(); cp.wait()
        o_ref[:] = scr[:]
    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wpad, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wpad, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(start, rec)
trial("dma rows (N,8)->(wpad,8)", t_dma_rows8)

# C. DMA row-range of (N, 128) HBM -> (wpad, 128) VMEM
def t_dma_rows128():
    N, wpad = 4096, 264
    rec = jnp.asarray(rng.uniform(size=(N + wpad, 128)).astype(np.float32))
    start = jnp.asarray([[24]], dtype=jnp.int32)
    def k(s_ref, rec_ref, o_ref, scr, sem):
        st = pl.multiple_of((s_ref[0, 0] // 8) * 8, 8)
        cp = pltpu.make_async_copy(rec_ref.at[pl.ds(st, wpad)], scr, sem)
        cp.start(); cp.wait()
        o_ref[:] = scr[:]
    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wpad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wpad, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(start, rec)
trial("dma rows (N,128)->(wpad,128)", t_dma_rows128)

# D. DMA with UNALIGNED dynamic row start (no multiple_of hint)
def t_dma_unaligned():
    N, wpad = 4096, 264
    rec = jnp.asarray(rng.uniform(size=(N + wpad, 128)).astype(np.float32))
    start = jnp.asarray([[13]], dtype=jnp.int32)
    def k(s_ref, rec_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(rec_ref.at[pl.ds(s_ref[0, 0], wpad)], scr, sem)
        cp.start(); cp.wait()
        o_ref[:] = scr[:]
    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wpad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wpad, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(start, rec)
trial("dma rows UNALIGNED start (N,128)", t_dma_unaligned)
