"""In-loop carry-reuse wart probe on TPU (benchmarks/NOTES.md 'Known wart').

At 1M inside lax.fori_loop the reuse step rebuilt every iteration on
hardware (bench_jiggle coherence_static_1000000 rebuilt=10/10) while the
same carry reused fine sequentially and the same loop at 4M reused fine.
CPU at 1M with the pallas calls bypassed (skip_stage=5) does NOT
reproduce.  This probe bisects on hardware: skip_stage=5 first (XLA-only,
fast compile), then the full kernel path, dumping the three check terms
per iteration.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import treensearch_tpu.ops.fastpath as fp
from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops.grid import fresh_state
from treensearch_tpu.ops.fastpath import default_tiles_cap

N = int(os.environ.get("N", 1_000_000))
R = 0.02


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


rng = np.random.default_rng(0)
pts_np = rng.uniform(0, 1, (N, 3)).astype(np.float32)
cell = 1.0 * R
ijk = np.floor(pts_np / cell).astype(np.int64)
key = (ijk[:, 0] << 40) | (ijk[:, 1] << 20) | ijk[:, 2]
pts_np = pts_np[np.argsort(key, kind="stable")]

eng = TreeNSearch()
eng.add_point_set(pts_np)
eng.set_search_radius(R)
eng.set_all_searches(True)
eng.set_cell_size(cell)
eng._dense_cap = eng._default_dense_cap()
eng._tiles_cap = default_tiles_cap(N)
eng._pack = 4 if N >= 200_000 else 1
eng._wcap = 192
cfg = eng._make_cfg(eng._chunk, eng._stencil_w(cell))
pts = jnp.asarray(pts_np)


def probe(knobs, label, iters=6):
    # per-iteration dump of the check terms, built from the same pieces
    # build_and_search_fast_carry uses
    @jax.jit
    def loop(points, st, carry):
        def body(_, c):
            st, carry, reb, sg, ke, va = c
            prev = st
            from treensearch_tpu.ops.grid import update_grid
            st2 = update_grid(prev, points, jnp.float32(cell))
            same_grid = (prev.valid
                         & jnp.all(st2.grid_min == prev.grid_min)
                         & jnp.all(st2.n_cells == prev.n_cells)
                         & (st2.cell_size == prev.cell_size))
            lin, _, _, _ = fp._padded_lin(points, st2, cfg, knobs)
            keys_eq = jnp.all(lin == carry.lin_chk)
            sol, st, carry = fp.build_and_search_fast_carry(
                points, None, jnp.float32(R), jnp.float32(cell), st, carry,
                cfg, knobs)
            reb = jnp.roll(reb, -1).at[5].set(sol["rebuilt"])
            sg = jnp.roll(sg, -1).at[5].set(same_grid.astype(jnp.int32))
            ke = jnp.roll(ke, -1).at[5].set(keys_eq.astype(jnp.int32))
            va = jnp.roll(va, -1).at[5].set(carry.valid.astype(jnp.int32))
            return st, carry, reb, sg, ke, va
        z = jnp.zeros((6,), jnp.int32)
        return jax.lax.fori_loop(0, iters, body,
                                 (st, carry, z, z, z, z))

    st, carry, reb, sg, ke, va = loop(
        pts, fresh_state(), fp.make_fast_carry0(cfg, knobs))
    stamp(f"{label}: rebuilt={list(np.asarray(reb))} "
          f"same_grid={list(np.asarray(sg))} keys_eq={list(np.asarray(ke))} "
          f"carry_valid_after={list(np.asarray(va))}")


base = eng._knobs(True)
probe(base._replace(skip_stage=5), "skip5 (XLA only)")
probe(base._replace(skip_stage=3), "skip3 (pipeline, kernels off)")
probe(base, "full kernel path")
