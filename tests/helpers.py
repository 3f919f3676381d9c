"""Shared fixtures/harness mirroring the reference test strategy.

Reference: ``tests/tests.cpp`` — a regular-grid SPH-like generator
(``generate_point_grid_as_SPH``, ``tests.cpp:16-32``, search radius
1.99 x spacing for ~32 neighbors) and a compare harness that checks the
engine against the brute-force oracle across both pipelines and across
parallelism/granularity sweeps (``_compare_tns_with_bruteforce``,
``tests.cpp:34-89``).  Thread-count and recursion-cap sweeps have no TPU
meaning; the equivalent invariance sweeps here are pipeline tile (chunk)
size and the padding caps, including caps small enough to force the
overflow-regrow-recompile path.
"""

from __future__ import annotations

import numpy as np

from treensearch_tpu import TreeNSearch
from treensearch_tpu.oracle import BruteforceNSearch


def generate_point_grid_as_sph(bottom, top, spacing):
    """Regular grid + SPH-like radius (reference ``tests.cpp:16-32``)."""
    axes = [np.arange(bottom[d], top[d] + 0.5 * spacing, spacing)
            for d in range(3)]
    g = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([a.ravel() for a in g], axis=1).astype(np.float32)
    return pts, np.float32(1.99 * spacing)


def grid_for_n(n_target: int, spacing: float = 0.1):
    side = max(1, round(n_target ** (1.0 / 3.0)))
    top = (side - 1) * spacing
    return generate_point_grid_as_sph((0, 0, 0), (top, top, top), spacing)


def make_engine_and_oracle(sets, search_radius=None, active=None,
                           symmetric=True):
    """sets: list of (points, radii-or-None)."""
    eng = TreeNSearch()
    orc = BruteforceNSearch(search_radius=search_radius, symmetric=symmetric)
    for pts, rad in sets:
        eng.add_point_set(pts, rad)
        orc.add_point_set(pts, rad)
    if search_radius is not None:
        eng.set_search_radius(search_radius)
    eng.set_symmetric_search(symmetric)
    if active is None:
        eng.set_all_searches(True)
        orc.set_all_searches(True)
    else:
        for (i, j, a) in active:
            eng.set_active_search(i, j, a)
            orc.set_active_search(i, j, a)
    return eng, orc


def compare_engine_with_oracle(sets, search_radius=None, active=None,
                               symmetric=True, sweeps=True):
    """Engine/oracle exact parity across pipelines and granularity sweeps."""
    eng, orc = make_engine_and_oracle(sets, search_radius, active, symmetric)
    orc.run()

    # both pipelines (reference scalar + SIMD, tests.cpp:38-41)
    eng.run_scalar()
    orc.compare(eng)
    eng.run()
    orc.compare(eng)

    # zsort round trip: reorder positions (and radii), rerun, re-oracle
    # (reference tests.cpp:43-48)
    eng.prepare_zsort()
    orc2 = BruteforceNSearch(search_radius=search_radius, symmetric=symmetric)
    reordered = []
    for k, (pts, rad) in enumerate(sets):
        p2 = eng.apply_zsort(k, np.array(pts))
        r2 = eng.apply_zsort(k, np.array(rad)) if rad is not None else None
        reordered.append((p2, r2))
    for k, (p2, r2) in enumerate(reordered):  # resize invalidates the maps
        eng.resize_point_set(k, p2, r2)
        orc2.add_point_set(p2, r2)
    orc2.active = orc.active.copy()
    orc2.run()
    eng.run()
    orc2.compare(eng)

    if not sweeps:
        return

    # granularity sweeps: tile size and caps must not change results
    # (role of thread 1..11 and recursion-cap 100..1900 sweeps,
    # tests.cpp:50-86); tiny caps force the overflow-regrow path.
    for chunk in (32, 256):
        eng2, _ = make_engine_and_oracle(sets, search_radius, active,
                                         symmetric)
        eng2.set_chunk_size(chunk)
        eng2.run()
        orc.compare(eng2)
    for nbr_cap, cand_cap in ((8, 64), (144, 1024)):
        eng3, _ = make_engine_and_oracle(sets, search_radius, active,
                                         symmetric)
        eng3.set_neighbor_cap(nbr_cap)
        eng3.set_candidate_cap(cand_cap)
        eng3.run()
        orc.compare(eng3)
