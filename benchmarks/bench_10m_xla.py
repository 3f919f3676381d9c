import time, sys, os, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
from treensearch_tpu import TreeNSearch

def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

N, R = 10_000_000, 0.0101
rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)
eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.set_use_pallas(False)
eng.set_neighbor_cap(64)
stamp("run 10M (XLA path)")
eng.run()
counts = np.asarray(eng.get_neighbors(0, 0)[0])
stamp(f"done; stats {eng._last_stats}; total pairs {counts.sum()} "
      f"avg {counts.mean():.1f}")
step, st0 = eng.make_step_fn()
p = jnp.asarray(pts)
@jax.jit
def loop(p, st):
    def body(_, carry):
        st, acc = carry
        sol, st = step(st, p)
        return st, acc + sol["pairs"]["0-0"]["counts"][0] + jnp.sum(
            sol["pairs"]["0-0"]["nbrs"][::64], dtype=jnp.int32)
    return jax.lax.fori_loop(0, 3, body, (st, jnp.int32(0)))
st, acc = loop(p, st0); int(acc)
t0 = time.perf_counter(); st, acc = loop(p, st0); int(acc)
ms = (time.perf_counter() - t0) / 3 * 1e3
print(json.dumps({"metric": "pairs_10M_xla", "ms_per_run": ms,
                  "value": int(counts.sum()) / (ms / 1e3),
                  "unit": "pairs/s", "total_pairs": int(counts.sum())}),
      flush=True)
