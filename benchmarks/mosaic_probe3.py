import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def trial(name, fn):
    try:
        r = fn(); jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:130].replace(chr(10),' ')}", flush=True)

rng = np.random.default_rng(0)
def mk(lanes):
    def t():
        N, wpad = 4096, 264
        rec = jnp.asarray(rng.uniform(size=(N + wpad, lanes)).astype(np.float32))
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
            out_shape=jax.ShapeDtypeStruct((wpad, lanes), jnp.float32),
            scratch_shapes=[pltpu.VMEM((wpad, lanes), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(start, rec)
    return t

for lanes in (8, 16, 32, 64):
    trial(f"dma rows (N,{lanes})", mk(lanes))
