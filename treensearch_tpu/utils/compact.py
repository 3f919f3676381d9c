"""Branch-free row compaction — the TPU replacement for the reference's
AVX2 LUT stream compaction (``shuffle_lut.h:107-624``,
``_mm256_permutevar8x32`` pushes at ``TreeNSearch.cpp:2486-2492``).

``compact_rows(mask, values, out_w)`` moves the masked elements of each row
to the front, preserving order, using a log-shift network: each kept
element's displacement ``d = lane - (rank-1)`` is nondecreasing along the
row, so moving elements down by powers of two (ascending bits of d) never
collides (targets are distinct and order-preserving).  Everything is
``roll`` + ``where`` — pure VPU, no gathers/scatters/sorts — which makes it
fast in XLA and expressible in Pallas (Mosaic lowers ``roll`` natively but
not ``cumsum``/``sort``/``top_k``; see /tmp probe results 2026-08-16).
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_rows(mask: jnp.ndarray, values: jnp.ndarray,
                 out_w: int, fill: int = -1) -> jnp.ndarray:
    """(R, M) mask/values -> (R, out_w): masked values front-packed in lane
    order, ``fill``-padded.  Elements with rank > out_w are dropped (the
    caller tracks exact counts separately for overflow detection).

    The shift network runs as a fori_loop with a dynamic shift amount —
    one compiled body instead of log2(M) unrolled steps, keeping XLA
    compile time flat in M.
    """
    import jax

    r, m = mask.shape
    lane = jnp.arange(m, dtype=jnp.int32)[None, :]
    p = jnp.cumsum(mask.astype(jnp.int32), axis=1)      # inclusive rank
    keep = mask & (p <= out_w)
    d = jnp.where(keep, lane - (p - 1), 0)               # displacement >= 0
    v = jnp.where(keep, values, fill)
    n_steps = (m - 1).bit_length() if m > 1 else 0

    def body(i, carry):
        v, d, valid = carry
        s = jnp.left_shift(jnp.int32(1), i)
        in_v = jnp.roll(v, -s, axis=1)
        in_d = jnp.roll(d, -s, axis=1)
        in_valid = jnp.roll(valid, -s, axis=1) & (lane < m - s)
        take = in_valid & ((in_d & s) != 0)
        stay = valid & ((d & s) == 0)
        v = jnp.where(take, in_v, jnp.where(stay, v, fill))
        d = jnp.where(take, in_d - s, jnp.where(stay, d, 0))
        return v, d, take | stay

    if n_steps:
        v, _, _ = jax.lax.fori_loop(0, n_steps, body, (v, d, keep))
    if out_w > m:
        v = jnp.pad(v, ((0, 0), (0, out_w - m)), constant_values=fill)
    return v[:, :out_w]
