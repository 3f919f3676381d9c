"""Fused Pallas TPU kernel for the pair-search hot loop.

Role of the reference's ``_brute_force_simd`` + ``_prepare_brute_force_simd``
(``TreeNSearch.cpp:2161-2569``): for each tile of consecutive sorted query
points, fetch its stencil candidate windows, test ``d^2 <= r^2`` and emit
compacted padded-CSR rows.

Why a kernel (measured on v5e, 2026-08-16, benchmarks/kernel_probe.py):
  - XLA lowers the data-dependent window loads (vmapped dynamic_slice) to
    an element gather running at ~13 GB/s; the kernel uses real DMA.
  - XLA's roll-based compaction round-trips HBM between its ~13 shift
    steps (memory-bound: ~4.2 s for 1M rows at width 4608); the kernel
    keeps the whole mask->compact pipeline in VMEM, where the same steps
    are VPU-bound (~35 Tops/s measured).

Kernel shape (one grid step per tile of TILE sorted points):
  1. DMA the tile's 2*R candidate windows (two row-bounded subwindows per
     stencil (di, dj) offset, see ops/fastpath.py) from the transposed
     field array (F, N) in HBM into VMEM scratch.
  2. VPU: d^2, radius criteria, exact cell-match (window disjointness),
     self-exclusion; per-window exact counts.
  3. Two-stage in-VMEM compaction with static log-shift networks
     (pltpu.roll): window (TILE, WCAP) -> (TILE, PRE_CAP), concat
     -> (TILE, 2R*PRE_CAP) -> (TILE, nbr_cap).  Empty windows are skipped
     with @pl.when (a tile fully inside one grid row has R empty
     B-subwindows).

Field rows in the packed record array (float32): x, y, z, radius,
original index, set id.  Indices ride as exact f32 (requires N < 2**24;
the host falls back to the XLA path beyond that).

v1 scope: one point set with self-search — the headline benchmark
configuration; multi-set/multi-pair runs use the XLA fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_X, F_Y, F_Z, F_R, F_ORIG, F_SET = 0, 1, 2, 3, 4, 5
N_FIELDS = 8   # padded to 8 rows for clean tiling
DESC_W = 128   # descriptor row width (Mosaic wants 128-lane SMEM blocks)
LENS_OFF = 64  # column offset of window lengths (supports stencil_w <= 2)
N_PARAMS = 16


def _cumsum_lanes(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Inclusive prefix sum along lanes via Hillis-Steele static rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < m:
        shifted = pltpu.roll(x, s, 1)  # shifted[i] = x[i - s] (wrapping)
        x = x + jnp.where(lane >= s, shifted, 0)
        s <<= 1
    return x


def _compact_lanes(mask: jnp.ndarray, vals: jnp.ndarray, out_w: int,
                   p: jnp.ndarray = None) -> jnp.ndarray:
    """In-VMEM row compaction (see utils/compact.py for the algorithm).

    ``p``: optional precomputed inclusive rank (cumsum of mask).
    """
    t, m = mask.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    if p is None:
        p = _cumsum_lanes(mask.astype(jnp.int32), m)
    keep = mask & (p <= out_w)
    d = jnp.where(keep, lane - (p - 1), 0)
    v = jnp.where(keep, vals, -1)
    # validity rides as int32: Mosaic cannot rotate 1-bit vectors
    valid = keep.astype(jnp.int32)
    s = 1
    while s < m:
        in_v = pltpu.roll(v, m - s, 1)
        in_d = pltpu.roll(d, m - s, 1)
        in_valid = (pltpu.roll(valid, m - s, 1) != 0) & (lane < m - s)
        take = in_valid & ((in_d & s) != 0)
        stay = (valid != 0) & ((d & s) == 0)
        v = jnp.where(take, in_v, jnp.where(stay, v, -1))
        d = jnp.where(take, in_d - s, jnp.where(stay, d, 0))
        valid = (take | stay).astype(jnp.int32)
        s <<= 1
    return v[:, :out_w]


def make_pairs_call(tile: int, wcap: int, pre_cap: int, nbr_cap: int,
                    offs_2d, variable: bool, symmetric: bool,
                    interpret: bool = False):
    """Build the kernel caller for the given static shapes.

    ``offs_2d``: the (di, dj) stencil offsets; descriptor windows are laid
    out as [R A-subwindows] + [R B-subwindows], window w uses offset
    ``offs_2d[w % R]``.
    """
    n_ranges = len(offs_2d)
    n_win = 2 * n_ranges
    assert n_win <= LENS_OFF, "pallas kernel supports stencil_w <= 2"
    m2 = n_win * pre_cap
    # window DMA starts are aligned down to 128 lanes so Mosaic can prove
    # the lane-dimension slice divisible by its tiling; the true window
    # begins at a per-window offset < 128 inside the padded buffer
    wpad = wcap + 128

    def kernel(desc_ref, params_ref, q_ref, rec_ref,
               counts_ref, nbrs_ref, win, outc, sems):
        row = pl.program_id(0) % 8  # descriptor blocks cover 8 tiles
        gx = params_ref[0, 0]
        gy = params_ref[0, 1]
        gz = params_ref[0, 2]
        inv_cell = params_ref[0, 3]
        kx = params_ref[0, 4]
        ky = params_ref[0, 5]
        kz = params_ref[0, 6]
        r2_fixed = params_ref[0, 7]
        n_real = params_ref[0, 8]
        w_stencil = params_ref[0, 9]

        # 1. start all window DMAs (128-aligned starts), then wait for all
        def aligned(w):
            return pl.multiple_of((desc_ref[row, w] // 128) * 128, 128)

        for w in range(n_win):
            pltpu.make_async_copy(
                rec_ref.at[:, pl.ds(aligned(w), wpad)],
                win.at[w], sems.at[w]).start()
        for w in range(n_win):
            pltpu.make_async_copy(
                rec_ref.at[:, pl.ds(aligned(w), wpad)],
                win.at[w], sems.at[w]).wait()

        # 2. query fields (tile, 1)
        qx = q_ref[:, F_X:F_X + 1]
        qy = q_ref[:, F_Y:F_Y + 1]
        qz = q_ref[:, F_Z:F_Z + 1]
        q_orig = q_ref[:, F_ORIG:F_ORIG + 1]
        my_r2 = q_ref[:, F_R:F_R + 1] ** 2

        def cellof(v, g, k):
            return jnp.clip(jnp.floor((v - g) * inv_cell), 0.0, k - 1.0)

        q_i = cellof(qx, gx, kx)
        q_j = cellof(qy, gy, ky)
        q_k = cellof(qz, gz, kz)
        row_valid = q_orig < n_real

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (tile, wpad), 1)
        counts_ref[:, :] = jnp.zeros((tile, 1), jnp.int32)

        # 3. per-window mask + pre-compaction into outc scratch
        for w in range(n_win):
            di, dj = offs_2d[w % n_ranges]
            ln = desc_ref[row, LENS_OFF + w]
            off = desc_ref[row, w] - (desc_ref[row, w] // 128) * 128

            outc[:, w * pre_cap:(w + 1) * pre_cap] = \
                jnp.full((tile, pre_cap), -1, jnp.int32)

            @pl.when(ln > 0)
            def _(w=w, di=di, dj=dj, ln=ln, off=off):
                wx = win[w, F_X:F_X + 1, :]
                wy = win[w, F_Y:F_Y + 1, :]
                wz = win[w, F_Z:F_Z + 1, :]
                wo = win[w, F_ORIG:F_ORIG + 1, :]

                ddx = wx - qx
                ddy = wy - qy
                ddz = wz - qz
                d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                if variable:
                    crit = d2 <= my_r2
                    if symmetric:
                        wr = win[w, F_R:F_R + 1, :]
                        crit = crit | (d2 <= wr * wr)
                else:
                    crit = d2 <= r2_fixed
                c_i = cellof(wx, gx, kx)
                c_j = cellof(wy, gy, ky)
                c_k = cellof(wz, gz, kz)
                in_stencil = ((c_i == q_i + di) & (c_j == q_j + dj)
                              & (jnp.abs(c_k - q_k) <= w_stencil))
                mask = (crit & in_stencil
                        & (lane_w >= off) & (lane_w < off + ln)
                        & (wo != q_orig) & (wo < n_real) & row_valid)
                p = _cumsum_lanes(mask.astype(jnp.int32), wpad)
                counts_ref[:, :] = counts_ref[:, :] + p[:, wpad - 1:wpad]
                vals = (wo.astype(jnp.int32)
                        * jnp.ones((tile, 1), jnp.int32))
                outc[:, w * pre_cap:(w + 1) * pre_cap] = \
                    _compact_lanes(mask, vals, pre_cap, p=p)

        # 4. merge stage over the concatenated pre-compacted slots
        merged = outc[:, :]
        nbrs_ref[:, :] = _compact_lanes(merged >= 0, merged, nbr_cap)

    def call(n_tiles, desc, params, q_pad, rec_t):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, DESC_W), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, DESC_W), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, N_FIELDS), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nbr_cap), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * tile, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles * tile, nbr_cap), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_win, N_FIELDS, wpad), jnp.float32),
                pltpu.VMEM((tile, m2), jnp.int32),
                pltpu.SemaphoreType.DMA((n_win,)),
            ],
            interpret=interpret,
        )(desc, params, q_pad, rec_t)

    return call
