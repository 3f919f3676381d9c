"""Trace-level smoke guards: `python -m pytest -m smoke` (<60 s warm).

Round-4 postmortem: a half-landed refactor (`make_expand_call` missing
its `build_rec` parameter) broke the DEFAULT production path at trace
time, and nothing cheap caught it — the full interpret-mode suite costs
~45-100 s of XLA compile PER ROW on this 1-vCPU container, so it was
skipped before the snapshot.  These tests close that hole: they
`jax.eval_shape` the full engine over EVERY production-reachable static
knob combination at n~200 with tiny caps.  `eval_shape` runs the whole
Python trace — pallas_call traces its kernel body to build the jaxpr —
so any signature break, shape mismatch, or bad BlockSpec arithmetic
anywhere in the program surfaces in ~1 s per row with ZERO compiles.

What this tier does NOT check: numerics (test_pallas.py oracle rows) or
Mosaic lowering (bench.py / validate_1m on hardware).

Reference analog: the reference's whole suite builds and runs on every
commit (`/root/reference/tests/main.cpp:14-32`); this is the compile-
budget-aware equivalent gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treensearch_tpu.config import SearchConfig
from treensearch_tpu.ops import fastpath as fp
from treensearch_tpu.ops.grid import fresh_state

pytestmark = pytest.mark.smoke

N1 = 208


def _cfg(n_sets=1, variable=False, symmetric=False, n=N1):
    sizes = tuple([n // n_sets] * (n_sets - 1)
                  + [n - (n // n_sets) * (n_sets - 1)])
    pairs = tuple((i, j) for i in range(n_sets) for j in range(n_sets))
    return SearchConfig(set_sizes=sizes, active_pairs=pairs,
                        variable=variable, symmetric=symmetric,
                        stencil_w=1, chunk=128, cand_cap=256, nbr_cap=64)


def _knobs(**kw):
    base = dict(use_pallas=True, interpret=True, wcap=128, fat_wcap=256,
                fat_cap=16, dense_cap=1 << 14, rows_cap=1 << 10,
                pre_cap=32, pre_edge=16)
    base.update(kw)
    return fp.FastKnobs(**base)


def _shapes(cfg):
    pts = jax.ShapeDtypeStruct((cfg.n_points, 3), jnp.float32)
    rad = jax.ShapeDtypeStruct((cfg.n_points,), jnp.float32) \
        if cfg.variable else None
    return pts, rad


def _trace(cfg, knobs):
    pts, rad = _shapes(cfg)
    r = jax.ShapeDtypeStruct((), jnp.float32)
    jax.eval_shape(
        lambda p, rr: fp.build_and_search_fast(
            p, rad and rr, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), cfg, knobs),
        pts, rad if rad is not None else r)


# ---- the production kernel-branch matrix --------------------------------
# api.py auto-selection reaches: pack 1 (small n, per-window), pack 4/8/16
# lane_batch, rec_expand auto-on for pack >= 8 row tiles; users can pin
# any pack / brick / tps.  Every row below is a distinct static trace.
ROWS = []
for pack in (1, 4, 8, 16):
    for lane_batch in ((False, True) if pack in (1, 8) else (True,)):
        for rec_expand in ((False, True) if pack >= 8 else (False,)):
            ROWS.append(dict(pack=pack, lane_batch=lane_batch,
                             rec_expand=rec_expand))
ROWS.append(dict(pack=8, lane_batch=True, brick=(2, 2, 3)))
ROWS.append(dict(pack=16, lane_batch=True, rec_expand=True, tps=1))


@pytest.mark.parametrize("kw", ROWS,
                         ids=lambda kw: "-".join(f"{k}{v}"
                                                 for k, v in kw.items()))
def test_trace_single_set_fixed(kw):
    _trace(_cfg(), _knobs(**kw))


@pytest.mark.parametrize("kw", [
    dict(pack=8, lane_batch=True, rec_expand=True),
    dict(pack=8, lane_batch=True, rec_expand=True, shared_compact=False),
    dict(pack=4, lane_batch=False),
])
def test_trace_multiset_variable(kw):
    # 3 sets x full active matrix x variable symmetric radii: the widest
    # multi-block kernel (shared-compaction on and off)
    _trace(_cfg(n_sets=3, variable=True, symmetric=True), _knobs(**kw))


def test_trace_variable_asymmetric():
    _trace(_cfg(variable=True, symmetric=False),
           _knobs(pack=16, lane_batch=True, rec_expand=True))


def test_trace_xla_fallback():
    # use_pallas=False routes the XLA tile path (sparse-domain fallback)
    _trace(_cfg(), _knobs(use_pallas=False))


def test_trace_step_fn_carry_reuse():
    # the temporal-coherence step fn (reuse branch traces both arms)
    cfg = _cfg()
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True)
    carry0 = fp.make_fast_carry0(cfg, knobs)
    pts, _ = _shapes(cfg)
    jax.eval_shape(
        lambda p, c: fp.build_and_search_fast_carry(
            p, None, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), c, cfg, knobs),
        pts, carry0)


def test_trace_fused_reduce():
    # the fused neighbor-reduce (device visitor) at the production knobs,
    # with a payload and a 3-output callback
    import jax.numpy as jnp2
    cfg = _cfg(n_sets=2)
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True)
    rs = fp.ReduceSpec(
        lambda env: (jnp2.ones_like(env["d2"]), env["d2"], env["p0_j"]),
        3, True)
    carry0 = fp.make_fast_carry0(cfg, knobs)
    pts, _ = _shapes(cfg)
    pl = jax.ShapeDtypeStruct((cfg.n_points, 2), jnp.float32)
    jax.eval_shape(
        lambda p, c, q: fp.build_and_search_fast_carry(
            p, None, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), c, cfg, knobs, reduce_spec=rs, payload=q),
        pts, carry0, pl)


def test_trace_mask_contract():
    # the tile-layout bitmask contract (run_mask) at the production
    # knobs, multi-set active matrix
    cfg = _cfg(n_sets=2)
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True)
    carry0 = fp.make_fast_carry0(cfg, knobs)
    pts, _ = _shapes(cfg)
    jax.eval_shape(
        lambda p, c: fp.build_and_search_fast_carry(
            p, None, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), c, cfg, knobs, mask_output=True),
        pts, carry0)


def test_trace_sharded_fast():
    # multi-chip production config on an 8-device CPU mesh (trace only)
    from jax.sharding import Mesh
    from treensearch_tpu.parallel import sharded as sh
    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("d",))
    cfg = _cfg(n_sets=2, n=512)
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True,
                   tiles_cap=64)
    pts, _ = _shapes(cfg)
    jax.eval_shape(
        lambda p: sh.build_and_search_sharded_fast(
            p, None, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), cfg, mesh, knobs),
        pts)


def test_trace_sharded_reduce_payload():
    # sharded fused reduce with payload routing (records fields 6,7)
    from jax.sharding import Mesh
    from treensearch_tpu.parallel import sharded as sh
    devs = np.array(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("d",))
    cfg = _cfg(n_sets=2, n=512)
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True,
                   tiles_cap=64)
    rs = fp.ReduceSpec(lambda env: env["p0_j"], 1, True)
    pts, _ = _shapes(cfg)
    pl = jax.ShapeDtypeStruct((cfg.n_points, 2), jnp.float32)
    jax.eval_shape(
        lambda p, q: sh.build_and_search_sharded_fast(
            p, None, jnp.float32(0.02), jnp.float32(0.022),
            fresh_state(), cfg, mesh, knobs, reduce_spec=rs, payload=q),
        pts, pl)


def test_run_tiny_interpret_end_to_end():
    # ONE concrete execution at the production branch point (pack 8,
    # lane_batch, rec_expand/win_sorted) against the numpy oracle: keeps
    # the smoke tier honest about values, small enough to compile fast
    from treensearch_tpu.oracle import BruteforceNSearch
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1, (N1, 3)).astype(np.float32)
    r = 0.18
    cfg = _cfg()
    knobs = _knobs(pack=8, lane_batch=True, rec_expand=True)
    sol, _ = fp.build_and_search_fast_jit(
        jnp.asarray(pts), None, jnp.float32(r), jnp.float32(r * 1.1),
        fresh_state(), cfg, knobs)
    assert int(sol["pallas_used"]) == 1
    assert int(sol["tile_overflow"]) == 0
    sol = fp.attach_blocks(sol)
    orc = BruteforceNSearch(search_radius=r)
    orc.add_point_set(pts)
    orc.set_all_searches(True)
    orc.run()
    cnt = np.asarray(sol["pairs"]["0-0"]["counts"])
    nb = np.asarray(fp.materialize_nbrs(sol["pairs"]["0-0"]))
    for i in range(N1):
        got = np.sort(nb[i][: cnt[i]])
        assert np.array_equal(got, orc.neighbors[(0, 0)][i]), i
