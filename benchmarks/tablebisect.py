import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

N = 1 << 20
CAP = 1 << 22
rng = np.random.default_rng(0)
lin_s = jnp.sort(jnp.asarray(rng.integers(0, CAP, N).astype(np.int32)))
iota = jnp.arange(N, dtype=jnp.int32)

stamp("scatter-min compile start")
@jax.jit
def scat(lin_s):
    t = jnp.full((CAP + 1,), N, jnp.int32)
    return t.at[lin_s].min(iota)[0]
print(float(scat(lin_s))); stamp("scatter-min done")

stamp("assoc-scan cummin compile start")
@jax.jit
def scan(lin_s):
    t = jnp.full((CAP + 1,), N, jnp.int32).at[lin_s].set(iota)
    t = jax.lax.associative_scan(jnp.minimum, t, reverse=True)
    return t[0]
print(float(scan(lin_s))); stamp("assoc-scan done")

stamp("cummin via jnp flip+minimum.accumulate start")
@jax.jit
def scan2(lin_s):
    t = jnp.full((CAP + 1,), N, jnp.int32).at[lin_s].set(iota)
    t = jnp.flip(jax.lax.cummin(jnp.flip(t)))
    return t[0]
try:
    print(float(scan2(lin_s))); stamp("cummin done")
except Exception as e:
    stamp(f"cummin failed: {type(e).__name__} {str(e)[:100]}")
