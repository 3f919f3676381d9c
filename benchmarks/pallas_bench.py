"""Device timing of the Pallas pair kernel vs the XLA tile loop."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.ops.fastpath import FastKnobs, build_and_search_fast_jit


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(n, r, knobs, reps=10, zsorted=True):
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    cell = 1.5 * r
    cfg = SearchConfig((n,), ((0, 0),), False, False, 1, 1024, 512, 80)

    sol, st = build_and_search_fast_jit(pts, None, jnp.float32(r),
                                        jnp.float32(cell), fresh_state(),
                                        cfg, knobs)
    flags = {k: int(sol[k]) for k in
             ("cand_max", "straddle", "dense_overflow")}
    maxc = int(sol["pairs"]["0-0"]["max_count"])
    pairs = int(np.asarray(sol["pairs"]["0-0"]["counts"]).sum())

    @jax.jit
    def loop(p, st0):
        def body(_, carry):
            st, acc = carry
            sol, st = build_and_search_fast_jit(
                p, None, jnp.float32(r), jnp.float32(cell), st, cfg, knobs)
            pp = sol["pairs"]["0-0"]
            return st, acc + pp["counts"][0] + jnp.sum(pp["nbrs"],
                                                       dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, (st0, jnp.int32(0)))

    st2, acc = loop(pts, fresh_state())
    v = int(acc)
    t0 = time.perf_counter()
    st2, acc = loop(pts, fresh_state())
    v = int(acc)
    dt = (time.perf_counter() - t0) / reps
    stamp(f"n={n} pallas={knobs.use_pallas} tile={knobs.tile} "
          f"wcap={knobs.wcap}: {dt*1e3:.1f} ms/step "
          f"{pairs/dt:.3e} pairs/s flags={flags} maxc={maxc}")


N = int(os.environ.get("N", 131072))
R = float(os.environ.get("R", 0.04))
stamp(f"start N={N}")
dense = 1 << 19 if N <= (1 << 18) else 1 << 20
import itertools, json
cfgs = json.loads(os.environ.get(
    "CFGS", '[[256, 2048, 1024], [320, 1024, 1024], [192, 2048, 768]]'))
for (wc, fc, fw) in cfgs:
    bench(N, R, FastKnobs(tile=128, group=8, wcap=wc, dense_cap=dense,
                          use_pallas=True, fat_cap=fc, fat_wcap=fw))
