"""Z-curve (Morton) reordering of user arrays — the zsort subsystem.

Reference: ``prepare_zsort`` / ``apply_zsort`` / ``get_zsort_order``
(``TreeNSearch.cpp:2571-2716``, ``TreeNSearch.h:443-481``).  The reference
computes an approximate Z-order (cell-granular fast path, or per-point
64-bit Morton keys at a refined <=2**21 cells/axis resolution in the
no-tree path) and lets the user gather arbitrary strided arrays into that
order; SPH codes do this every few steps to keep memory access coherent
(``README.md:95-111``).

Here the order is always the exact per-point Morton order at 2**20
cells/axis over the world box (the analog of the reference's refined
no-tree path, ``TreeNSearch.cpp:2663-2716``), computed by a two-word
bit-spread + stable ``lax.sort``.  ``apply_zsort`` is a fused device
gather (``jnp.take`` rows), the TPU-native equivalent of the reference's
OpenMP out-of-place gather permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import keys as K

_ZSORT_BITS = 20


def _order_body(points: jnp.ndarray, box_min: jnp.ndarray,
                box_max: jnp.ndarray) -> jnp.ndarray:
    n = points.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    extent = jnp.maximum(jnp.max(box_max - box_min), 1e-30)
    scale = (1 << _ZSORT_BITS) / extent
    q = jnp.clip((points - box_min[None, :]) * scale,
                 0, (1 << _ZSORT_BITS) - 1).astype(jnp.int32)
    hi, lo = K.morton_keys_2word(q, bits=_ZSORT_BITS)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, _, new_to_old = K.sort_by_2word_key(hi, lo, iota)
    return new_to_old


@jax.jit
def zsort_order(points: jnp.ndarray, box_min: jnp.ndarray,
                box_max: jnp.ndarray) -> jnp.ndarray:
    """new_to_old permutation for one point set (n, 3) over a world box."""
    return _order_body(points, box_min, box_max)


@jax.jit
def zsort_orders(points_list, box_min: jnp.ndarray, box_max: jnp.ndarray):
    """Per-set new_to_old permutations in ONE device program (one sort per
    set; one dispatch total — the role of the reference's parallel
    per-set sorts, ``TreeNSearch.cpp:2598-2657``)."""
    return [_order_body(p, box_min, box_max) for p in points_list]


@jax.jit
def zsort_orders_from_cells(lin_list, dy: jnp.ndarray, dz: jnp.ndarray):
    """CELL-GRANULAR per-set Z-orders from the LAST run's cell assignment
    — the TPU redesign of the reference's cells fast path
    (``TreeNSearch.cpp:2598-2657``).

    The reference reuses the cells of the last search to compute an
    approximate Z-order at cell granularity (sort the m cells by Morton
    key, emit each cell's points in their current order) because its CPU
    cell sort is O(m log m) instead of O(n log n).  On TPU the sort is
    not the bottleneck (``lax.sort`` ~1.3 ms at 1M), but the semantics
    port directly and CHEAPER than the per-point path: the carried
    padded linear cell ids (``FastCarry.lin_chk``) are decoded to cell
    coords elementwise — no world-box min/max reduction over every set
    and no re-quantization of the positions — then one stable 2-word-key
    sort per set reproduces "cells in Morton order, intra-cell order
    preserved" (points of one cell share a key; the sort is stable).

    ``lin = ((i + w) * dy + (j + w)) * dz + (k + w)``: the +w pad shift
    is a constant lattice translation, so sorting by Morton of the
    padded coords is a valid Z-curve ordering of the same cells (the
    reference's order is approximate by design).  Grid axes are capped
    at 2^15 cells (ops/grid.py), so padded coords fit ``bits=16``.
    """
    outs = []
    for lin in lin_list:
        n = lin.shape[0]
        if n == 0:
            outs.append(jnp.zeros((0,), jnp.int32))
            continue
        k_p = lin % dz
        j_p = (lin // dz) % dy
        i_p = lin // (dz * dy)
        ijk = jnp.stack([i_p, j_p, k_p], axis=1)
        hi, lo = K.morton_keys_2word(ijk, bits=16)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, _, new_to_old = K.sort_by_2word_key(hi, lo, iota)
        outs.append(new_to_old)
    return outs


@jax.jit
def apply_order(data: jnp.ndarray, new_to_old: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``data`` (n, ...) into the new order."""
    return jnp.take(data, new_to_old, axis=0)


@jax.jit
def apply_order_batch(arrays, new_to_old: jnp.ndarray):
    """Gather k arrays into the new order in ONE device program.

    A per-array ``apply_zsort`` dispatch costs ~40 ms through a remote
    TPU tunnel; SPH codes reorder many arrays per zsort (positions,
    velocities, densities, ... — ``README.md:100-111``), so the batched
    gather is the practical interface."""
    return [jnp.take(a, new_to_old, axis=0) for a in arrays]


def make_zsort_step(n_sets: int = 1):
    """In-graph fused zsort for simulation loops: a jittable
    ``step(points_list, arrays_per_set) -> (orders, sorted_points,
    sorted_arrays)`` that computes the world box, all per-set orders and
    every gather in one program (zero host sync; usable under
    ``lax.scan`` at a chosen cadence)."""

    def step(points_list, arrays_per_set=None):
        assert len(points_list) == n_sets
        mins = [jnp.min(p, axis=0) for p in points_list if p.shape[0]]
        maxs = [jnp.max(p, axis=0) for p in points_list if p.shape[0]]
        box_min = jnp.min(jnp.stack(mins), axis=0) if mins else \
            jnp.zeros((3,), jnp.float32)
        box_max = jnp.max(jnp.stack(maxs), axis=0) if maxs else \
            jnp.ones((3,), jnp.float32)
        orders = [_order_body(p, box_min, box_max) for p in points_list]
        pts_sorted = [jnp.take(p, o, axis=0)
                      for p, o in zip(points_list, orders)]
        arrs_sorted = None
        if arrays_per_set is not None:
            arrs_sorted = [
                [jnp.take(a, o, axis=0) for a in arrs]
                for arrs, o in zip(arrays_per_set, orders)]
        return orders, pts_sorted, arrs_sorted

    return step
