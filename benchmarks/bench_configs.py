"""BASELINE.json benchmark configs 2-4 (beyond bench.py's headline 1M).

Prints one JSON line per config:
  2. 500k-point SPH-style loop: rebuild every step, zsort every 8 steps.
  3. fluid + static boundary, asymmetric active searches (XLA multi-set
     fast path).
  4. variable per-point radii with symmetric search.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu import TreeNSearch


def steady_state_ms(eng, pts, radii=None, iters=10):
    """Time run()-equivalent steps in-graph on device data."""
    eng.run()  # settle caps
    step, st0 = eng.make_step_fn()
    p = jnp.asarray(pts)
    r = jnp.asarray(radii) if radii is not None else None

    @jax.jit
    def loop(p, r, st):
        def body(_, carry):
            st, acc = carry
            sol, st = step(st, p, r)
            name = next(iter(sol["pairs"]))
            pp = sol["pairs"][name]
            # counts-only checksum (raw nbr tiles of skipped tiers are
            # undefined by contract, ops/pallas_pairs.py)
            return st, acc + jnp.sum(pp["counts"][::257], dtype=jnp.int32)
        return jax.lax.fori_loop(0, iters, body, (st, jnp.int32(0)))

    st, acc = loop(p, r, st0)
    int(acc)
    t0 = time.perf_counter()
    st, acc = loop(p, r, st0)
    int(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def total_pairs(eng):
    tot = 0
    for i in range(eng.get_n_sets()):
        for j in range(eng.get_n_sets()):
            if eng.is_search_active(i, j):
                tot += int(np.asarray(eng.get_neighbors(i, j)[0]).sum())
    return tot


def report(name, ms, pairs, extra=None):
    out = {"metric": name, "value": pairs / (ms / 1e3), "unit": "pairs/s",
           "ms_per_run": ms, "total_pairs": pairs}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


rng = np.random.default_rng(0)

# --- config 2: 500k SPH-style, zsort cadence
n = 500_000
r = 0.0254  # ~32 avg neighbors
pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(r)
eng.set_all_searches(True)
eng.set_cell_size(1.0 * r)  # measured-best occupancy (benchmarks/sweep_v3)
eng.prepare_zsort()
pts = np.asarray(eng.apply_zsort(0, pts))
eng.resize_point_set(0, pts)
ms = steady_state_ms(eng, pts)
report("sph_500k_step", ms, total_pairs(eng))
# zsort cadence, host path: prepare + FUSED 3-array apply (one dispatch)
vel = np.zeros((n, 3), np.float32)
rho = np.zeros((n, ), np.float32)
eng.prepare_zsort()                       # warm the order/gather programs
eng.apply_zsort_batch(0, [pts.copy(), vel.copy(), rho.copy()])
t0 = time.perf_counter()
eng.prepare_zsort()
eng.apply_zsort_batch(0, [pts, vel, rho])
zs = (time.perf_counter() - t0) * 1e3
report("sph_500k_zsort_3arrays", zs, total_pairs(eng),
       {"note": "prepare + fused apply_zsort_batch of 3 arrays"})
# in-graph fused zsort step (device-resident arrays, zero host sync)
from treensearch_tpu.ops.zsort import make_zsort_step
zstep = jax.jit(lambda p, a: make_zsort_step(1)([p], [a]))
pd = jnp.asarray(pts)
arrs = [jnp.asarray(vel), jnp.asarray(rho)]
_o, _p, _a = zstep(pd, arrs)
jax.block_until_ready(_p)
t0 = time.perf_counter()
for _ in range(10):
    _o, _p, _a = zstep(pd, arrs)
jax.block_until_ready(_p)
zs2 = (time.perf_counter() - t0) / 10 * 1e3
report("sph_500k_zsort_ingraph", zs2, total_pairs(eng),
       {"note": "fused in-graph order+gather of positions+2 arrays"})

# --- config 3: fluid + boundary, asymmetric active matrix
nf, nb = 400_000, 100_000
fluid = rng.uniform(0, 1, (nf, 3)).astype(np.float32)
boundary = rng.uniform(0, 1, (nb, 3)).astype(np.float32)
eng = TreeNSearch()
f = eng.add_point_set(fluid)
b = eng.add_point_set(boundary)
eng.set_search_radius(r)
eng.set_active_search(f, f, True)
eng.set_active_search(f, b, True)
# multi-set path: time via the raw step fn on device arrays
eng.run()
step, st0 = eng.make_step_fn()
pf, pb = jnp.asarray(fluid), jnp.asarray(boundary)
pcat = jnp.concatenate([pf, pb], axis=0)

@jax.jit
def loop3(p, st):
    def body(_, carry):
        st, acc = carry
        sol, st = step(st, p)
        pp = sol["pairs"]["0-0"]
        return st, acc + jnp.sum(pp["counts"][::257], dtype=jnp.int32)
    return jax.lax.fori_loop(0, 10, body, (st, jnp.int32(0)))

st, acc = loop3(pcat, st0)
int(acc)
t0 = time.perf_counter()
st, acc = loop3(pcat, st0)
int(acc)
ms = (time.perf_counter() - t0) / 10 * 1e3
report("fluid_boundary_step", ms, total_pairs(eng),
       {"note": "asymmetric active matrix, pallas candidate-set blocks"})

# --- config 4: variable radii, symmetric
n4 = 250_000
pts4 = rng.uniform(0, 1, (n4, 3)).astype(np.float32)
rad4 = rng.uniform(0.8, 1.25, n4).astype(np.float32) * 0.032
eng = TreeNSearch()
eng.add_point_set(pts4, rad4)
eng.set_all_searches(True)
eng.set_symmetric_search(True)
ms = steady_state_ms(eng, pts4, rad4)
report("variable_symmetric_step", ms, total_pairs(eng))
