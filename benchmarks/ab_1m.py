"""Single-config 1M timing at the bench knobs (for kernel A/B via the
TNS_MXU_PREFIX / TNS_PACKED_CARRY env toggles; fresh process per combo)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp

from treensearch_tpu import TreeNSearch

N, R, ITERS = 1_000_000, 0.02, 10
rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)
eng = TreeNSearch()
eng.add_point_set(pts)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.prepare_zsort()
pts = np.asarray(eng.apply_zsort(0, pts))
eng.resize_point_set(0, pts)
eng.set_cell_size(float(os.environ.get("CELLF", 1.0)) * R)
eng._wcap = int(os.environ.get("WCAP", 192))
eng._pack = int(os.environ.get("PACK", 4))
if "TPS" in os.environ:
    eng.set_tiles_per_step(int(os.environ["TPS"]))
if "MXU" in os.environ:
    eng._mxu_prefix = os.environ["MXU"] == "1"
if "PRE" in os.environ:
    eng.set_prestage_caps(int(os.environ["PRE"]),
                          int(os.environ.get("PREE", os.environ["PRE"])))
eng.run()
total = int(np.asarray(eng.get_neighbors(0, 0)[0]).sum())
assert total == 32759462, total
step, st0 = eng.make_step_fn()
p = jnp.asarray(pts)


@jax.jit
def loop(p, st):
    def body(_, carry):
        st, acc = carry
        sol, st = step(st, p)
        pr = sol["pairs"]["0-0"]
        pass  # counts-only checksum; nbr blocks now live in sol["blocks"]
        return st, acc + jnp.sum(pr["counts"][::257], dtype=jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))


st, acc = loop(p, st0)
int(acc)
t0 = time.perf_counter()
st, acc = loop(p, st0)
int(acc)
dt = (time.perf_counter() - t0) / ITERS * 1e3
print(f"AB mxu={os.environ.get('TNS_MXU_PREFIX','1')} "
      f"packed={os.environ.get('TNS_PACKED_CARRY','1')} "
      f"wcap={eng._wcap} pack={eng._pack}: {dt:.1f} ms/step "
      f"({total / dt * 1e3 / 1e8:.2f}e8 pairs/s)", flush=True)
