"""The r4 prep redesign (benchmarks/probe_r5d.out) replaced three 1M-scale
scatters with arithmetic + one key sort; these tests pin the new
constructions to the scatter semantics they replaced bit-for-bit."""
import numpy as np
import jax.numpy as jnp

import treensearch_tpu.ops.fastpath as fp
from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops.grid import fresh_state


import functools


@functools.lru_cache(maxsize=None)
def _prep(variable, seed=3, n=4000, cell=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    rad = rng.uniform(0.04, 0.06, n).astype(np.float32) if variable else None
    cfg = SearchConfig((n,), ((0, 0),), variable, variable, 1,
                       1024, 512, 96)
    knobs = fp.FastKnobs(wcap=192, dense_cap=1 << 14, use_pallas=False,
                         tiles_cap=600)
    rj = jnp.asarray(rad) if variable else None
    _, state = fp.build_and_search_fast(
        jnp.asarray(pts), rj, jnp.float32(cell), jnp.float32(cell),
        fresh_state(), cfg, knobs)
    carry = fp._pallas_prep(jnp.asarray(pts), rj, state, cfg,
                            knobs._replace(use_pallas=True))
    assert int(carry.tile_overflow) == 0
    return carry, n


def test_opad_matches_scatter_semantics():
    for variable in (False, True):
        carry, n = _prep(variable)
        opad = np.asarray(carry.opad)
        ref = np.full(opad.shape, n, np.int32)
        ref[np.asarray(carry.pp)] = np.asarray(carry.idx_s)
        assert np.array_equal(opad, ref)


def test_inv_perm_qpos_match_scatter_semantics():
    for variable in (False, True):
        carry, n = _prep(variable)
        idx_s = np.asarray(carry.idx_s)
        inv_ref = np.zeros(n, np.int32)
        inv_ref[idx_s] = np.arange(n, dtype=np.int32)
        q_ref = np.zeros(n, np.int32)
        q_ref[idx_s] = np.asarray(carry.pp)
        assert np.array_equal(np.asarray(carry.inv_perm), inv_ref)
        assert np.array_equal(np.asarray(carry.qpos), q_ref)
