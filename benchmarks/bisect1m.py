import time, numpy as np, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp
from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.ops.fastpath import FastKnobs, build_and_search_fast_jit

def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

rng = np.random.default_rng(0)
for n, dense in ((131072, 1<<19), (1<<20, 1<<22)):
    pts = jnp.asarray(rng.uniform(0,1,(n,3)).astype(np.float32))
    r = 0.04 if n == 131072 else 0.02
    cfg = SearchConfig((n,), ((0,0),), False, False, 1, 1024, 512, 80)
    knobs = FastKnobs(tile=128, group=8, wcap=384, dense_cap=dense)
    stamp(f"compile n={n} start")
    sol, st = build_and_search_fast_jit(pts, None, jnp.float32(r), jnp.float32(1.5*r), fresh_state(), cfg, knobs)
    jax.block_until_ready(sol)
    stamp(f"compile n={n} done; cand_max={int(sol['cand_max'])} maxc={int(sol['pairs']['0-0']['max_count'])}")
    @jax.jit
    def loop(p, st0):
        def body(_, carry):
            st, acc = carry
            sol, st = build_and_search_fast_jit(p, None, jnp.float32(r), jnp.float32(1.5*r), st, cfg, knobs)
            return st, acc + sol["pairs"]["0-0"]["counts"][0] + jnp.sum(sol["pairs"]["0-0"]["nbrs"], dtype=jnp.int32)
        return jax.lax.fori_loop(0, 10, body, (st0, jnp.int32(0)))
    stamp("loop compile start")
    st2, acc = loop(pts, fresh_state()); jax.block_until_ready(acc)
    stamp("loop compiled+ran")
    t0=time.perf_counter(); st2, acc = loop(pts, fresh_state()); val=int(acc)
    dt=(time.perf_counter()-t0)/10
    pairs = int(np.asarray(sol['pairs']['0-0']['counts']).sum())
    stamp(f"n={n}: {dt*1e3:.1f} ms/step  {pairs/dt:.3e} pairs/s")
