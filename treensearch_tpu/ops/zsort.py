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

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import keys as K

_ZSORT_BITS = 20


@jax.jit
def zsort_order(points: jnp.ndarray, box_min: jnp.ndarray,
                box_max: jnp.ndarray) -> jnp.ndarray:
    """new_to_old permutation for one point set (n, 3) over a world box."""
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
def apply_order(data: jnp.ndarray, new_to_old: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``data`` (n, ...) into the new order."""
    return jnp.take(data, new_to_old, axis=0)
