"""De-risk the LANE-MAJOR kernel flip: candidates on lanes, queries on
sublanes, so the staging compaction's shift network runs along the LANE
axis (hardware lane shuffles) instead of sublane rolls (measured ~5.8
ms/stride at strides >= 16, probe_r9b/r8b).

Measures, at the real 1M tile-loop scale (grid = 4692 steps ~ tiles/tps):
  S_net: current sublane-direction network, (192, 1152) plane
  L_net: lane-direction network, (128, 9*192) plane (192-lane blocks)
  L_dot: flipped MXU prefix: 9 x (128,192)@(192,192) bf16 dots
  T_xps: 9 x (128,192) int32 sublane<->lane transposes (output relayout)
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
REPS = 5

def run(name, kernel, in_shape):
    f = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec(in_shape, lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * 8, 128), jnp.int32),
    )
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, in_shape).astype(np.int32))
    @jax.jit
    def loop(x):
        def it(i, acc):
            return acc + f(x + acc)[0, 0]
        return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
    v = int(loop(x))
    t0 = time.perf_counter()
    v = int(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    stamp(f"{name}: {dt*1e3:.1f} ms/loop ({dt/GRID*1e6:.2f} us/step)")

# ---- S_net: the current sublane network (displacement flavor) ---------
def s_net_kernel(x_ref, o_ref):
    m, L = 192, 1152
    INV = jnp.int32(1 << 30)
    x = x_ref[:]
    keep = x > 0
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, L), 0)
    # fake exact-enough prefix: cumsum stand-in via iota (timing only)
    p = sub // 3 + 1
    d = jnp.where(keep, sub - (p - 1), INV)
    v = x
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
    st = jnp.where(d == 0, v, -1)
    o_ref[:] = st[0:8, 0:128]

# ---- L_net: lane-direction network over (128, 9*192) -------------------
def l_net_kernel(x_ref, o_ref):
    Q, B, W = 128, 192, 9
    INV = jnp.int32(1 << 30)
    L = B * W
    x = x_ref[:]
    keep = x > 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, L), 1) % B
    p = lane // 3 + 1
    d = jnp.where(keep, lane - (p - 1), INV)
    v = x
    s = 1
    while s < 256:
        in_d = pltpu.roll(d, L - s, 1)
        in_v = pltpu.roll(v, L - s, 1)
        take = ((in_d & s) != 0) & (lane < B - s)
        stay = (d & s) == 0
        d = jnp.where(take, in_d - s, jnp.where(stay, d, INV))
        v = jnp.where(take, in_v, v)
        s <<= 1
    st = jnp.where(d == 0, v, -1)
    o_ref[:] = st[0:8, 0:128]

# ---- L_dot: flipped MXU prefix ------------------------------------------
def l_dot_kernel(x_ref, o_ref):
    Q, B, W = 128, 192, 9
    x = x_ref[:]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tril = (r_i <= c_i).astype(jnp.bfloat16)
    acc = jnp.zeros((Q, 128), jnp.int32)
    for w in range(W):
        mw = x[:, w * B:(w + 1) * B].astype(jnp.bfloat16)
        pw = jax.lax.dot_general(mw, tril, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)
        acc = acc + pw[:, 0:128]
    o_ref[:] = acc[0:8, :]

# ---- T_xps: int32 transposes -------------------------------------------
def t_xps_kernel(x_ref, o_ref):
    Q, B, W = 128, 192, 9
    x = x_ref[:]
    acc = jnp.zeros((8, 128), jnp.int32)
    for w in range(W):
        t = jnp.swapaxes(x[:, w * B:(w + 1) * B], 0, 1)  # (192, 128)
        acc = acc + t[0:8, :]
    o_ref[:] = acc

run("S_net sublane (192,1152)", s_net_kernel, (192, 1152))
run("L_net lane (128,1728)", l_net_kernel, (128, 1728))
run("L_dot 9x(128,192)@(192,192)", l_dot_kernel, (128, 1728))
run("T_xps 9x(128,192) swapaxes", t_xps_kernel, (128, 1728))
stamp("probe_r9d done")
