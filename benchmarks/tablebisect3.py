import time, sys, os
import numpy as np
import jax, jax.numpy as jnp

def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

N = 1 << 20
CAP = 1 << 22
rng = np.random.default_rng(0)
lin_s = jnp.sort(jnp.asarray(rng.integers(0, CAP, N).astype(np.int32)))

stamp("blocked cumsum compile start")
@jax.jit
def t2(lin_s):
    hist = jnp.zeros((CAP + 1,), jnp.int32).at[lin_s + 1].add(1)
    B = 4096
    pad = (-hist.shape[0]) % B
    h2 = jnp.pad(hist, (0, pad)).reshape(B, -1)
    within = jnp.cumsum(h2, axis=1)
    rows = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(within[:, -1])[:-1]])
    table = (within + rows[:, None]).reshape(-1)[: CAP + 1]
    return table[-1]
print(float(t2(lin_s))); stamp("blocked done")

@jax.jit
def loop(lin_s):
    def body(i, acc):
        return acc + t2((lin_s + acc) % CAP)
    return jax.lax.fori_loop(0, 10, body, jnp.int32(0))
v = int(loop(lin_s)); t0 = time.perf_counter(); v = int(loop(lin_s))
stamp(f"blocked cumsum 10x: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")
