"""AOT memory analysis of the 10M cfg5 first-run program (no execution)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops import fastpath as fp

SCALE = float(os.environ.get("SCALE", 1.0))
N0, N1, N2 = (int(8_000_000*SCALE), int(1_500_000*SCALE), int(500_000*SCALE))
R = float(os.environ.get("R", 0.009)) / SCALE ** (1/3)
rng = np.random.default_rng(0)
sets_np = [rng.uniform(0, 1, (n, 3)).astype(np.float32) for n in (N0, N1, N2)]
eng = TreeNSearch()
for p in sets_np: eng.add_point_set(p)
eng.set_search_radius(R); eng.set_all_searches(True); eng.set_cell_size(1.0*R)
eng.set_neighbor_cap(int(os.environ.get("NBR", 64)))
eng.set_neighbor_cap(int(os.environ.get("NBR1", 16)), set_j=1)
eng.set_neighbor_cap(int(os.environ.get("NBR2", 8)), set_j=2)
eng.set_prestage_caps(64, 48)
eng._tiles_cap = int(int(os.environ.get("TILES", 88000))*SCALE)
eng._fat_cap = int(os.environ.get("FATCAP", 512))
eng.set_coherence(False)

eng._pack = 16
eng._dense_cap = eng._default_dense_cap()
points, radii = eng._assemble()
cell = eng._effective_cell_size()
w = eng._stencil_w(cell)
cfg = eng._make_cfg(eng._chunk, w)
knobs = eng._knobs(True)
print("tracing/compiling ...", flush=True)
t0 = time.time()
comp = jax.jit(fp.build_and_search_fast,
               static_argnames=("cfg", "knobs")).lower(
    points, radii, jnp.float32(0.0), jnp.float32(cell),
    eng._grid_state, cfg=cfg, knobs=knobs).compile()
ma = comp.memory_analysis()
print(f"compiled in {time.time()-t0:.0f}s")
for k in dir(ma):
    if not k.startswith("_"):
        v = getattr(ma, k)
        if isinstance(v, (int, float)):
            print(f"{k}: {v/1e9:.3f} GB" if v > 1e6 else f"{k}: {v}")
