"""Degenerate-data sweep across the production kernel-branch matrix.

The reference stress suites sweep threads {1,2,4,7,8,9,12,24} and
recursion caps over combinatorial small sets and a dynamic emitter
(``tests/tests.cpp:50-86,287-427``).  The TPU engine's analog of that
parallelism axis is its static kernel-branch matrix — record pack x
lane-batched pipeline x expand record build — which until round 5 was
only exercised on well-behaved clouds.  Each branch row here compiles
ONE program (fixed shapes) and pushes four degenerate data variants
through it, every one compared exactly against the O(n^2) oracle:

  uniform          control
  coincident       every point identical (one cell, all-pairs dense)
  one_cell         all points inside a single grid cell (fat tier)
  cluster_outlier  dense cluster + far outlier (sparse huge domain)

wcap=64 is deliberately snug so the degenerate variants route through
the FAT tier and the engine's overflow-regrow loop.
"""

import jax
import numpy as np
import pytest

from helpers import make_engine_and_oracle


@pytest.fixture(autouse=True)
def _clear_between_rows():
    """This module alone compiles more distinct programs (branch rows x
    regrow steps) than the CPU backend survives in-process (see the
    conftest module-scope fixture); drop live executables after every
    row — the persistent disk cache keeps reruns cheap."""
    yield
    jax.clear_caches()

N0, N1 = 129, 31   # tile-boundary set sizes (129 straddles two tiles)
R = 0.3

BRANCHES = [
    dict(pack=1, lane_batch=False, rec_expand=False),
    dict(pack=8, lane_batch=True, rec_expand=False),
    dict(pack=8, lane_batch=True, rec_expand=True),   # production default
    dict(pack=16, lane_batch=True, rec_expand=True),
]


def _variants(rng):
    u0 = rng.uniform(0, 1, (N0, 3)).astype(np.float32)
    u1 = rng.uniform(0, 1, (N1, 3)).astype(np.float32)
    yield "uniform", u0, u1
    c = np.full((N0, 3), 0.5, np.float32)
    yield "coincident", c, np.full((N1, 3), 0.5, np.float32)
    yield "one_cell", (0.5 + 0.1 * R * rng.uniform(0, 1, (N0, 3))
                       ).astype(np.float32), \
        (0.5 + 0.1 * R * rng.uniform(0, 1, (N1, 3))).astype(np.float32)
    cl0 = (0.2 + 0.5 * R * rng.uniform(0, 1, (N0, 3))).astype(np.float32)
    cl0[-1] = (40.0, 40.0, 40.0)   # far outlier stretches the domain
    yield "cluster_outlier", cl0, \
        (0.2 + 0.5 * R * rng.uniform(0, 1, (N1, 3))).astype(np.float32)


def _pin(eng, kw):
    eng.set_use_pallas(True, interpret=True)
    eng.set_window_cap(64)
    eng._fat_wcap, eng._fat_cap = 192, 16
    eng.set_record_pack(kw["pack"])
    eng.set_lane_batch(kw["lane_batch"])
    eng._rec_expand = kw["rec_expand"]
    eng._rec_expand_user = True
    eng.set_neighbor_cap(168)   # coincident: every other point qualifies


@pytest.mark.parametrize("kw", BRANCHES,
                         ids=lambda kw: "-".join(f"{k}{v}"
                                                 for k, v in kw.items()))
def test_degenerate_data_across_kernel_branches(kw):
    rng = np.random.default_rng(42)
    variants = list(_variants(rng))
    _, u0, u1 = variants[0]
    eng, _ = make_engine_and_oracle([(u0, None), (u1, None)],
                                    search_radius=R)
    _pin(eng, kw)
    for name, p0, p1 in variants:
        eng.resize_point_set(0, p0)
        eng.resize_point_set(1, p1)
        eng.run()
        assert eng._last_stats.get("path") == "fast", name
        _, orc = make_engine_and_oracle([(p0, None), (p1, None)],
                                        search_radius=R)
        orc.run()
        orc.compare(eng)


def test_degenerate_variable_radii_production_branch():
    # variable+symmetric through the production branch (pack 8,
    # lane-batched, expand build) on the coincident and one-cell clouds
    rng = np.random.default_rng(7)
    r0 = rng.uniform(0.5 * R, R, N0).astype(np.float32)
    r1 = rng.uniform(0.5 * R, R, N1).astype(np.float32)
    variants = list(_variants(rng))
    _, u0, u1 = variants[0]
    eng, _ = make_engine_and_oracle([(u0, r0), (u1, r1)],
                                    search_radius=None, symmetric=True)
    _pin(eng, dict(pack=8, lane_batch=True, rec_expand=True))
    for name, p0, p1 in variants[:3]:   # uniform, coincident, one_cell
        eng.resize_point_set(0, p0, r0)
        eng.resize_point_set(1, p1, r1)
        eng.run()
        assert eng._last_stats.get("path") == "fast", name
        _, orc = make_engine_and_oracle([(p0, r0), (p1, r1)],
                                        search_radius=None, symmetric=True)
        orc.run()
        orc.compare(eng)
