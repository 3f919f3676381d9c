"""Cell-key encoding and two-word vectorized range search.

TPU-native replacement for the reference's run-length cell extraction +
octree (``TreeNSearch.cpp:837-1113,1197-1822``): points are quantized to a
uniform grid of up to 2**15 cells per axis (same domain limit as the
reference, ``TreeNSearch.cpp:510-515``) and given a *row-major* composite
key split over two int32 words:

    hi = i << 15 | j        (30 bits)
    lo = k                  (15 bits)

Sorting lexicographically by (hi, lo) groups points by cell in row-major
(i, j, k) order.  The crucial property: for a fixed (i+di, j+dj), the cells
(k-W .. k+W) are *contiguous* in this order, so the 3x3x3 (or wider)
stencil of a cell collapses to (2W+1)^2 contiguous candidate ranges — each
found with one lower_bound + one upper_bound over the sorted keys.  This
replaces the reference's ghost-cell octree leaf gather
(``TreeNSearch.cpp:1873-2018``) with regular, coalesced range gathers that
XLA/Pallas can tile.

All searches are branch-free vectorized binary searches (fori_loop over
ceil(log2 N) steps), jit/TPU friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Same hard domain limit as the reference (TreeNSearch.cpp:510-515): the
# world box may span at most 2**15 cells per axis.
MAX_CELLS_PER_DIM = 1 << 15
_KEY_SHIFT = 15


def quantize(points: jnp.ndarray, grid_min: jnp.ndarray, inv_cell: jnp.ndarray,
             n_cells: jnp.ndarray) -> jnp.ndarray:
    """Quantize float32 points (N, 3) to int32 cell coords (N, 3).

    Matches the reference quantization ``(int16)((p - min) / cell)`` at
    ``TreeNSearch.cpp:917-961`` (truncation toward zero is safe because
    points lie inside the world box, so p - min >= 0). Coords are clamped
    to [0, n_cells-1] for safety against float round-off at the box edge.
    """
    ijk = jnp.floor((points - grid_min[None, :]) * inv_cell).astype(jnp.int32)
    return jnp.clip(ijk, 0, n_cells[None, :] - 1)


def cell_keys(ijk: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-major two-word key: hi = i<<15 | j, lo = k."""
    hi = (ijk[:, 0] << _KEY_SHIFT) | ijk[:, 1]
    lo = ijk[:, 2]
    return hi, lo


def key_hi(i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    return (i << _KEY_SHIFT) | j


def searchsorted_2word(hi: jnp.ndarray, lo: jnp.ndarray,
                       q_hi: jnp.ndarray, q_lo: jnp.ndarray,
                       side: str) -> jnp.ndarray:
    """Vectorized searchsorted over a lexicographically sorted 2-word key.

    ``hi``/``lo``: the sorted key words, shape (M,).
    ``q_hi``/``q_lo``: query words, any (equal) shape.
    Returns insertion indices with numpy ``searchsorted`` semantics.

    Implemented as a fixed-trip-count branch-free binary search so it
    traces to a tiny fori_loop of gathers + compares (no dynamic shapes).
    """
    assert side in ("left", "right")
    m = hi.shape[0]
    if m == 0:
        return jnp.zeros(jnp.shape(q_hi), jnp.int32)
    # Interval [0, m] halves with ceiling each step; bit_length(m)+1 trips
    # always reach length 0 (bit_length alone is one short for e.g. m=1000).
    n_steps = int(m).bit_length() + 1

    lo_b = jnp.zeros(jnp.shape(q_hi), jnp.int32)
    hi_b = jnp.full(jnp.shape(q_hi), m, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        # converged lanes (lo_b == hi_b) must not move: their mid would
        # index out of bounds (clamped gather) and bisect past the answer
        live = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        khi = hi[mid]
        klo = lo[mid]
        if side == "left":
            go_right = (khi < q_hi) | ((khi == q_hi) & (klo < q_lo))
        else:
            go_right = (khi < q_hi) | ((khi == q_hi) & (klo <= q_lo))
        go_right = go_right & live
        lo_b = jnp.where(go_right, mid + 1, lo_b)
        hi_b = jnp.where(go_right | ~live, hi_b, mid)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, n_steps, body, (lo_b, hi_b))
    return lo_b


def morton_keys_2word(ijk: jnp.ndarray, bits: int = 20) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3D Morton (Z-curve) code as two int32 words for the zsort subsystem.

    Replaces libmorton's BMI2 encode (``extern/libmorton/morton.h:30-60``,
    used at ``TreeNSearch.cpp:2617,2693``) with a branch-free
    magic-number bit spread on the VPU.  Supports up to ``bits`` <= 20 bits
    per axis (the reference's no-tree zsort refines to <= 2**21 cells per
    axis, ``TreeNSearch.cpp:2677-2688``; 2**20 gives the same practical
    resolution while fitting 2x30 bits in two int32 words).

    hi = interleave3(i >> 10, j >> 10, k >> 10)   (3 * (bits-10) bits)
    lo = interleave3(i & 1023, j & 1023, k & 1023) (30 bits)
    Lexicographic (hi, lo) order == full 3*bits Morton order.
    """
    assert bits <= 20
    low10 = (1 << 10) - 1

    def spread10(v):
        # Spread 10 bits: b9..b0 -> bits 27,24,...,0 (every 3rd position).
        v = v & low10
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    lo = (spread10(k) << 2) | (spread10(j) << 1) | spread10(i)
    hi = (spread10(k >> 10) << 2) | (spread10(j >> 10) << 1) | spread10(i >> 10)
    return hi, lo


def sort_by_2word_key(hi: jnp.ndarray, lo: jnp.ndarray,
                      *payload: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Stable sort by lexicographic (hi, lo); payload arrays carried along."""
    return jax.lax.sort((hi, lo) + payload, num_keys=2, is_stable=True)
