"""Lane-vs-sublane compaction network, COMPUTE-DOMINATED version of
probe_r9d (which was DMA-bound: all rungs timed the per-step input DMA).
Each grid step chains K=8 dependent network applications on data
synthesized in-register; per-network time = slope / K.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

GRID = int(os.environ.get("GRID", 4692))
K = 8
REPS = 5

def run(name, kernel):
    f = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * 8, 128), jnp.int32),
    )
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, (8, 128)).astype(np.int32))
    @jax.jit
    def loop(x):
        def it(i, acc):
            return acc + f(x + acc)[0, 0]
        return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
    v = int(loop(x))
    t0 = time.perf_counter()
    v = int(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    stamp(f"{name}: {dt*1e3:.1f} ms/loop ({dt/GRID/K*1e6:.3f} us/net)")

def s_net_kernel(x_ref, o_ref):
    m, L = 192, 1152
    INV = jnp.int32(1 << 30)
    seed = x_ref[0, 0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, L), 0)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (m, L), 1)
    v = sub * 7 + lane_g + seed
    acc = jnp.zeros((8, 128), jnp.int32)
    for rep in range(K):
        keep = ((v >> 3) & 3) == 0
        p = sub // 2 + 1       # data-independent stand-in prefix
        p = jnp.where(keep, p, p)  # keep the dep, zero extra cost
        d = jnp.where(keep, sub - (p - 1), INV)
        s = 1
        while s < 256:
            in_d = pltpu.roll(d, m - s, 0) if s < 8 else jnp.concatenate(
                [d[s:, :], jnp.zeros((s, L), jnp.int32)], axis=0)
            in_v = pltpu.roll(v, m - s, 0) if s < 8 else jnp.concatenate(
                [v[s:, :], jnp.zeros((s, L), jnp.int32)], axis=0)
            take = ((in_d & s) != 0) & (sub < m - s)
            stay = (d & s) == 0
            d = jnp.where(take, in_d - s, jnp.where(stay, d, INV))
            v = jnp.where(take, in_v, v)
            s <<= 1
        v = jnp.where(d == 0, v, -1) + 1   # feed back (dependent chain)
    o_ref[:] = v[0:8, 0:128]

def l_net_kernel(x_ref, o_ref):
    Q, B, W = 128, 192, 9
    L = B * W
    INV = jnp.int32(1 << 30)
    seed = x_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, L), 1) % B
    sub_g = jax.lax.broadcasted_iota(jnp.int32, (Q, L), 0)
    v = lane * 7 + sub_g + seed
    for rep in range(K):
        keep = ((v >> 3) & 3) == 0
        p = lane // 2 + 1      # data-independent stand-in prefix
        p = jnp.where(keep, p, p)
        d = jnp.where(keep, lane - (p - 1), INV)
        s = 1
        while s < 256:
            in_d = pltpu.roll(d, L - s, 1)
            in_v = pltpu.roll(v, L - s, 1)
            take = ((in_d & s) != 0) & (lane < B - s)
            stay = (d & s) == 0
            d = jnp.where(take, in_d - s, jnp.where(stay, d, INV))
            v = jnp.where(take, in_v, v)
            s <<= 1
        v = jnp.where(d == 0, v, -1) + 1
    o_ref[:] = v[0:8, 0:128]

def l_dot_kernel(x_ref, o_ref):
    Q, B, W = 128, 192, 9
    seed = x_ref[0, 0]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tril = (r_i <= c_i).astype(jnp.bfloat16)
    sub_g = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    acc = jnp.zeros((Q, 128), jnp.int32)
    for rep in range(K):
        for w in range(W):
            mw = (((sub_g * 5 + w + seed + acc[0, 0]) >> 2) & 1
                  ).astype(jnp.bfloat16)
            pw = jax.lax.dot_general(mw, tril, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.int32)
            acc = acc + pw[:, 0:128]
    o_ref[:] = acc[0:8, :]

run("S_net sublane (192,1152) x8", s_net_kernel)
run("L_net lane (128,1728) x8", l_net_kernel)
run("L_dot 9x(128,192)@(192,192) x8", l_dot_kernel)
stamp("probe_r9e done")
