import time, sys, os, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
from treensearch_tpu import TreeNSearch
from treensearch_tpu import native_oracle as no

def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

rng = np.random.default_rng(0)
nf, nb = 200_000, 100_000
R = 0.025
fluid = rng.uniform(0, 1, (nf, 3)).astype(np.float32)
boundary = rng.uniform(0, 1, (nb, 3)).astype(np.float32)
eng = TreeNSearch()
f = eng.add_point_set(fluid)
b = eng.add_point_set(boundary)
eng.set_search_radius(R)
eng.set_active_search(f, f, True)
eng.set_active_search(f, b, True)
stamp("run (fluid+boundary, 2 pairs)")
eng.run()
stamp(f"stats {eng._last_stats}")

for (si, sj, pi, pj, same) in ((0, 0, fluid, fluid, True), (0, 1, fluid, boundary, False)):
    counts, offs, nbrs = no.grid_search_pair(pi, pj, radius=R, same_set=same)
    ec, en = eng.get_neighbors(si, sj)
    ec, en = np.asarray(ec), np.asarray(en)
    assert np.array_equal(ec, counts), (si, sj, int(np.sum(ec != counts)))
    for i in range(0, pi.shape[0], 43):
        got = np.sort(en[i][:ec[i]]); want = np.sort(nbrs[offs[i]:offs[i+1]])
        assert np.array_equal(got, want), (si, sj, i)
stamp("fluid+boundary parity EXACT (both pairs)")

# steady-state timing
step, st0 = eng.make_step_fn()
pcat = jnp.asarray(np.concatenate([fluid, boundary]))
@jax.jit
def loop(p, st):
    def body(_, carry):
        st, acc = carry
        sol, st = step(st, p)
        acc = acc + sol["pairs"]["0-0"]["counts"][0] \
            + jnp.sum(sol["pairs"]["0-0"]["nbrs"], dtype=jnp.int32) \
            + jnp.sum(sol["pairs"]["0-1"]["nbrs"], dtype=jnp.int32)
        return st, acc
    return jax.lax.fori_loop(0, 10, body, (st, jnp.int32(0)))
st, acc = loop(pcat, st0); int(acc)
t0 = time.perf_counter(); st, acc = loop(pcat, st0); int(acc)
ms = (time.perf_counter() - t0) / 10 * 1e3
pairs = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum()) + \
    int(np.asarray(eng.get_neighbors(0, 1)[0]).sum())
print(json.dumps({"metric": "fluid_boundary_300k_step", "ms_per_run": ms,
                  "value": pairs / (ms / 1e3), "unit": "pairs/s",
                  "total_pairs": pairs, "stats": str(eng._last_stats)}),
      flush=True)
