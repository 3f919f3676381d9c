"""Fused Pallas TPU kernel for the pair-search hot loop (v4: cell-run tiles
+ candidate-set output blocks).

Role of the reference's ``_brute_force_simd`` + ``_prepare_brute_force_simd``
(``TreeNSearch.cpp:2161-2569``): for each tile of 128 sorted query points,
fetch its stencil candidate windows, test ``d^2 <= r^2`` and emit compacted
padded-CSR neighbor rows.

v3 design (replaces the r1 two-subwindow scheme; see benchmarks/NOTES.md
lever 1): the host lays the sorted points out ROW-ALIGNED — every occupied
grid row (fixed (i, j), all k) is padded to a multiple of 128 slots — so a
tile of 128 consecutive slots always lies in ONE grid row.  Each stencil
offset (di, dj) then maps to exactly ONE contiguous k-run of the neighbor
row: window = sorted positions [table[row' + k0 - W], table[row' + k1 + W + 1])
where [k0, k1] is the tile's k-extent.  Consequences, all load-bearing:

  - one window per (di, dj) instead of two row-bounded subwindows: the
    candidate volume per query drops ~3x and the ``straddle`` fallback of
    r1 disappears by construction;
  - the windows of distinct (di, dj) are DISJOINT ranges of the sorted
    array (different grid rows / k-runs), so no neighbor can be counted
    twice and the expensive per-candidate cell-membership check of r1
    (quantize + 3-axis compare, ~12 VPU ops/element) is unnecessary:
    ``d^2 <= r^2`` alone is exact;
  - padding slots carry sentinel records (coords NaN, orig = n): NaN
    fails every ``d^2 <= r^2`` compare, so sentinels are excluded against
    real points AND against each other — no validity lanes needed, and
    the index-equality self-exclusion is only needed where the query's
    own record can actually appear: the CENTER (0, 0) window of its own
    tile (every other window is a different grid row).

v4 additions (round 3):

  - CANDIDATE-SET OUTPUT BLOCKS: the neighbor set of query q against
    candidate set sj does not depend on which set q belongs to (the
    active matrix only selects WHICH (set_i, set_j) lists exist — the
    geometry mask, self-exclusion and the symmetric OR rule are all
    set_i-independent).  So the kernel emits one counts+neighbors block
    per DISTINCT candidate set sj instead of one per active pair; the
    host maps pair (si, sj) -> block(sj) and gathers set_i's rows.  A
    3-set all-active matrix (9 pairs) costs 3 compactions per window,
    not 9, and the r2 "<= 4 active pairs" gate becomes "<= 8 distinct
    candidate sets" (any pair matrix over <= 8 sets).
  - ASYMMETRIC PER-WINDOW PRE-CAPS: the center (di=dj=0) window holds
    each query's own cell column and collects far more survivors than
    edge windows, so per-window staging widths are (center_cap, edge_cap)
    instead of uniform — the final merge network shrinks ~2x.  Separate
    device maxima (shared counts rows n_blocks/n_blocks+1) drive
    separate regrows.

Measured v5e facts that still shape the layout (benchmarks/, 2026-08-16):
  - sublane-dim DMA of a (N, 128) array takes exact UNALIGNED dynamic
    starts; lane-dim slices need 128 alignment -> candidate records are
    one point per 128-lane row and windows are exact row-range DMAs;
  - lane rotates are ~7x costlier than sublane rotates -> candidates on
    SUBLANES, queries on LANES; all log-shift networks rotate sublanes;
  - ``cumsum``/``sort``/dynamic gathers do not lower in Mosaic -> the
    compaction is a Hillis-Steele prefix + power-of-two shift network.

Record arrays are INT32-typed: coordinates ride as f32 bit patterns
bitcast into ints, indices/set ids as plain ints (exact at any n).  The
reverse — ints bitcast into f32 lanes — is unsound on TPU: indices
< 2^23 are f32 denormals and float relayouts flush them to zero.

Two tiers: the narrow kernel (small wcap) handles all tiles but skips
those whose widest window exceeds it; a "fat" kernel with a large wcap
re-runs just those tiles, addressed through a scalar-prefetched tile-id
list (``PrefetchScalarGridSpec`` indirect block indexing).

Output contract: the ``nbrs`` blocks of tiles a tier skips (fat tiles in
the narrow tier, dummy-id grid steps in the fat tier) are UNDEFINED memory
unless ``skip_stage`` forces the -1 fill — consumers must select the tier
at gather time via ``fat_slot`` (``ops/fastpath.py`` does), and benchmarks
must checksum counts, not raw nbr blocks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Process-start defaults for the A/B toggles; the live values are threaded
# through ``FastKnobs`` (part of the jit cache key) — see ops/fastpath.py.
# Measured at 1M on v5e (benchmarks/ab_1m.py, 2026-08-17): MXU prefix
# -30 ms/step, packed carry +13 ms/step.
DEFAULT_MXU_PREFIX = os.environ.get("TNS_MXU_PREFIX", "1") == "1"
DEFAULT_PACKED_CARRY = os.environ.get("TNS_PACKED_CARRY", "0") == "1"
# v2 single-plane packed compaction (see _compact_sub); env A/B switch
DEFAULT_COMPACT_V2 = os.environ.get("TNS_COMPACT_V2", "1") == "1"
# large-stride shift flavor in the compaction networks: slice+zero-pad
# instead of pltpu.roll.  probe_r8b priced the network's strides at 1M:
# strides 1-8 ~4.6 ms TOTAL, strides 16-128 ~5.9 ms EACH — the
# large-distance sublane rolls dominate the whole kernel.  The rolled
# tail (rows >= m-s) is always discarded by the `sub < m-s` guard, so a
# zero-filled shift is bit-identical.
DEFAULT_SHIFT_SLICE = os.environ.get("TNS_SHIFT_SLICE", "1") == "1"
# lane-chunked compaction networks (0 = one full-width network); see
# _compact_sub — pressure-relief A/B knob, results identical
DEFAULT_NET_CHUNK = int(os.environ.get("TNS_NET_CHUNK", "0"))

F_X, F_Y, F_Z, F_R, F_ORIG, F_SET = 0, 1, 2, 3, 4, 5
N_FIELDS = 8    # padded to 8 record columns
TILE = 128      # queries per tile == lane width
DESC_W = 128    # descriptor row width
LENS_OFF = 64   # descriptor column of window lengths (max 49 windows, W<=3)
A_COL = 62      # descriptor column: tile's first SORTED point index
CNT_COL = 63    # descriptor column: tile's real point count (<= 128)
FAT_COL = 127   # descriptor column: 1 = tile needs the fat kernel

# Padding-slot coordinate: NaN makes d^2 NaN, and NaN <= r^2 is false, so
# sentinel records fail the distance test against every candidate AND
# against each other (sentinel query vs sentinel candidate: d^2 = NaN).
# The latter is what lets the kernel skip the index self-exclusion compare
# outside the center window (a 1e18 sentinel would give d^2 = 0 there).
SENTINEL = float("nan")


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """out[i] = x[i + s] for i < m - s, 0 beyond — the up-shift every
    network stride needs.  For s >= 8 a sublane SLICE at an 8-aligned
    offset + zero pad replaces ``pltpu.roll(x, m - s, 0)``: bit-identical
    where consumed (the wrapped tail is always masked by ``sub < m - s``)
    and ~5x cheaper on v5e for large s (benchmarks/probe_r8b.out)."""
    m = x.shape[0]
    if DEFAULT_SHIFT_SLICE and s % 8 == 0:
        return jnp.concatenate(
            [x[s:, :], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0)
    return pltpu.roll(x, m - s, 0)


def _cumsum_sub(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Inclusive prefix sum along sublanes (axis 0), Hillis-Steele."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    s = 1
    while s < m:
        if DEFAULT_SHIFT_SLICE and s % 8 == 0:
            # shifted[i] = x[i - s], zeros below row s (the guard keeps
            # only rows >= s anyway) — slice flavor, see _shift_up
            shifted = jnp.concatenate(
                [jnp.zeros((s, x.shape[1]), x.dtype), x[:m - s, :]], axis=0)
            x = x + shifted
        else:
            shifted = pltpu.roll(x, s, 0)   # shifted[i] = x[i - s]
            x = x + jnp.where(sub >= s, shifted, 0)
        s <<= 1
    return x


def _mask_prefix_mxu(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix COUNT of a boolean mask along sublanes via one
    MXU matmul: p = tril(1) @ mask.  Exact: {0,1} operands are exact in
    bfloat16 and the f32 accumulator holds integers <= 2^24 (mask heights
    here are <= a few thousand).  Replaces log2(m) VPU roll+add steps
    with MACs the MXU does for free."""
    m = mask.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tri = (row >= col).astype(jnp.bfloat16)
    p = jax.lax.dot_general(
        tri, mask.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return p.astype(jnp.int32)


def _compact_sub(mask: jnp.ndarray, vals: jnp.ndarray, out_w: int,
                 p: jnp.ndarray = None, val_bound: int = 1 << 30,
                 mxu_prefix: bool = DEFAULT_MXU_PREFIX,
                 packed_carry: bool = DEFAULT_PACKED_CARRY,
                 strides_cap: int = 0):
    """Front-pack masked values along sublanes, order preserving.

    Displacements are monotone along the axis so moving by ascending
    power-of-two strides never collides (see utils/compact.py).  When the
    values fit below 2^sh (sh chosen so (m+1)*2^sh < 2^31), displacement
    and value ride PACKED in one int32 — one sublane rotate per step —
    otherwise two planes (2 rotates) are carried.
    """
    m, q = mask.shape
    # Lane-chunked scheduling (pressure relief, results identical: lanes
    # are independent): split wide planes into TNS_NET_CHUNK-lane
    # sub-networks so Mosaic schedules each with a smaller live set.
    # probe_r9e measured the network's arithmetic at ~2.9 ms/loop at 1M
    # while the in-situ cost is ~25 ms — the gap is spill/scheduling,
    # the one axis the round-4 laws say can pay.
    if DEFAULT_NET_CHUNK and q > DEFAULT_NET_CHUNK \
            and q % DEFAULT_NET_CHUNK == 0:
        ck = DEFAULT_NET_CHUNK
        return jnp.concatenate(
            [_compact_sub(mask[:, i:i + ck], vals[:, i:i + ck], out_w,
                          p=None if p is None else p[:, i:i + ck],
                          val_bound=val_bound, mxu_prefix=mxu_prefix,
                          packed_carry=packed_carry,
                          strides_cap=strides_cap)
             for i in range(0, q, ck)], axis=1)
    # DEV ONLY (attribution): cap the shift network at `strides_cap`
    # stride steps — displacements >= 2^strides_cap are LOST, results
    # are wrong; used by probes to price the network separately from
    # the mask reblock/encode work around it (benchmarks/probe_r8b.py)
    m_net = m if strides_cap <= 0 else min(m, 1 << strides_cap)
    # (m, 1) row vector: every use broadcasts along lanes
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    if p is None:
        p = _mask_prefix_mxu(mask) if mxu_prefix else \
            _cumsum_sub(mask.astype(jnp.int32), m)
    keep = mask & (p <= out_w)

    # v2 single-plane packed carry: c = displacement << sh | (value + 1),
    # invalid = 0.  Unlike the r3 packed_carry (measured SLOWER: it kept a
    # redundant displacement plane and +-1 offsets), zero-invalid needs no
    # separate validity state: an invalid slot's c is 0, so every stride
    # bit of it is 0 — it can never be taken and always "stays" as 0 — and
    # a placed survivor (displacement 0) also stays.  One roll + ~7 VPU
    # ops per stride vs two rolls + ~9.  Requires value+1 < 2^sh with the
    # top displacement bits still below 2^31; values are candidate indices
    # (>= 0 by the keep mask), encoded +1 so value 0 with displacement 0
    # is distinguishable from invalid.
    shv = 31 - (m - 1).bit_length() - 1
    if DEFAULT_COMPACT_V2 and 0 <= val_bound and val_bound + 1 < (1 << shv):
        c = jnp.where(keep, ((sub - (p - 1)) << shv) + (vals + 1), 0)
        s = 1
        while s < m_net:
            in_c = _shift_up(c, s)              # in_c[i] = c[i + s]
            bit = s << shv
            take = ((in_c & bit) != 0) & (sub < m - s)
            stay = (c & bit) == 0
            c = jnp.where(take, in_c - bit, jnp.where(stay, c, 0))
            s <<= 1
        return jnp.where(c > 0, (c & ((1 << shv) - 1)) - 1, -1)[:out_w, :]

    sh = 31 - (m + 1).bit_length()
    if packed_carry and 0 <= val_bound <= (1 << sh) - 1:
        # packed carry: c = (displacement+1) << sh | value; 0 = invalid
        e = jnp.where(keep, sub - (p - 1) + 1, 0)
        c = jnp.where(keep, (e << sh) | vals, 0)
        s = 1
        while s < m_net:
            in_c = _shift_up(c, s)              # in_c[i] = c[i + s]
            in_e = in_c >> sh
            take = (in_e > 0) & (((in_e - 1) & s) != 0) & (sub < m - s)
            stay = (e > 0) & (((e - 1) & s) == 0)
            c = jnp.where(take, in_c - (s << sh), jnp.where(stay, c, 0))
            e = jnp.where(take, in_e - s, jnp.where(stay, e, 0))
            s <<= 1
        out = jnp.where(e > 0, c & ((1 << sh) - 1), -1)
        return out[:out_w, :]

    # invalid slots carry INV = 2^30: every stride bit of INV is 0, so an
    # invalid value can never satisfy `take` and needs no separate
    # validity guard (4 fewer VPU ops per stride than a -1 encoding,
    # whose sign bits alias every stride test)
    INV = jnp.int32(1 << 30)
    d = jnp.where(keep, sub - (p - 1), INV)
    v = vals
    s = 1
    while s < m_net:
        in_d = _shift_up(d, s)              # in_d[i] = d[i + s]
        in_v = _shift_up(v, s)
        take = ((in_d & s) != 0) & (sub < m - s)
        stay = (d & s) == 0                  # invalid stays until taken
        d = jnp.where(take, in_d - s, jnp.where(stay, d, INV))
        v = jnp.where(take, in_v, v)
        s <<= 1
    # every placed survivor has consumed all its displacement bits
    return jnp.where(d == 0, v, -1)[:out_w, :]


def make_expand_call(n_tiles: int, tiles_cap: int, pack: int,
                     sentinel_orig: int, interpret: bool = False,
                     tpb: int = 8, slack_tiles: int = 8,
                     build_rec: bool = True):
    """Build the row-aligned padded record array and the query-tile array
    by CONTIGUOUS DMA COPIES from the sorted records instead of per-row
    gathers.

    ``build_rec=False`` (the win_sorted production mode): the pairs
    kernels DMA candidate windows straight from the SORTED packed rows
    (window descriptors are in sorted space — see fastpath._pallas_prep
    win_sorted), so no padded record array exists; this kernel builds
    ONLY the query tiles.  Call signature shrinks to ``(desc, recsT)``
    and the single output is ``q_t``.

    The padded layout is an expand-with-gaps of the sorted order: tile t's
    128 slots hold sorted points [a_t, a_t + cnt_t) followed by sentinel
    padding.  The XLA formulation is one (NPAD, 8)-row gather for the
    records plus its transpose for the queries — measured ~13 ns/row +
    ~7 ns/index on v5e (benchmarks/probe_r7a.out P3/S5: 8.8 + 13.8 ms at
    1M, scaling to ~220 ms at 10M).  Each tile's slots are CONSECUTIVE
    sorted positions, so a DMA engine copy + a lane rotate (the sorted
    start is not pack-aligned) does the same work at copy bandwidth.

    Inputs: ``desc`` (the window-descriptor array, whose A_COL/CNT_COL
    carry each tile's first sorted index and real count), ``recs`` =
    sorted packed records ((ceil(n/pack)+pad, 128), ``pack`` points per
    row), ``recsT`` = sorted records field-major ((8, n+lane slack)).
    Outputs: ``rec_pad`` ((tiles_cap+slack)*128//pack, 128) and ``q_t``
    (8, (tiles_cap+slack)*128).  Only the first ``n_tiles`` real tiles
    are written; everything a consumer can read beyond them is masked by
    window lengths / tile skip flags (see _pallas_search).
    """
    rpt = 128 // pack          # record rows per tile
    lpp = 128 // pack          # lanes per point (== rpt; 8 fields padded)
    assert rpt * pack == 128 and lpp >= N_FIELDS

    # sentinel patterns (NaN coords fail every distance compare; orig =
    # sentinel never equals a real query index; F_R stays 0 to match the
    # gather build's sentinel record exactly).  Built from iota inside
    # the kernel: pallas_call rejects captured array constants.
    nan_bits = int(np.float32(SENTINEL).view(np.int32))

    def _sent_from(field_idx):
        return jnp.where(
            field_idx <= F_Z, jnp.int32(nan_bits),
            jnp.where(field_idx == F_ORIG, jnp.int32(sentinel_orig),
                      jnp.where(field_idx == F_SET, jnp.int32(-1),
                                jnp.int32(0))))

    def kernel(*refs):
        if build_rec:
            (desc_ref, recs_ref, recsT_ref, rec_out, qt_out,
             buf, bufT, sems) = refs
        else:
            desc_ref, recsT_ref, qt_out, bufT, sems = refs
        rowT = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        spatT = _sent_from(rowT)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        if build_rec:
            lane_f = (jax.lax.broadcasted_iota(jnp.int32, (rpt, 128), 1)
                      % lpp)
            spat = _sent_from(lane_f)
            ptidx = (jax.lax.broadcasted_iota(jnp.int32, (rpt, 128), 0)
                     * pack
                     + jax.lax.broadcasted_iota(jnp.int32, (rpt, 128), 1)
                     // lpp)

        def issue(g, bank):
            s = desc_ref[g, A_COL]
            if build_rec:
                pltpu.make_async_copy(
                    recs_ref.at[pl.ds(s // pack, rpt + 2)],
                    buf.at[bank], sems.at[bank, 0]).start()
            pltpu.make_async_copy(
                recsT_ref.at[:, pl.ds(
                    pl.multiple_of((s // 128) * 128, 128), 256)],
                bufT.at[bank], sems.at[bank, 1]).start()

        issue(0, 0)
        for g in range(tpb):
            if g + 1 < tpb:
                issue(g + 1, (g + 1) % 2)
            bank = g % 2
            s = desc_ref[g, A_COL]
            cnt = desc_ref[g, CNT_COL]
            if build_rec:
                pltpu.make_async_copy(
                    recs_ref.at[pl.ds(s // pack, rpt + 2)],
                    buf.at[bank], sems.at[bank, 0]).wait()
            pltpu.make_async_copy(
                recsT_ref.at[:, pl.ds(
                    pl.multiple_of((s // 128) * 128, 128), 256)],
                bufT.at[bank], sems.at[bank, 1]).wait()
            if build_rec:
                # lane-rotate the packed rows by the sorted start's pack
                # phase, with cross-row carry (log steps, static shifts)
                ph = s % pack
                b = buf[bank]
                for k in range(max(pack.bit_length() - 1, 0)):
                    sh = lpp << k
                    rolled = pltpu.roll(b, 128 - sh, 1)
                    carry = pltpu.roll(b, rpt + 1, 0)  # row r <- row r+1
                    rolledc = pltpu.roll(carry, 128 - sh, 1)
                    lane_ok = jax.lax.broadcasted_iota(
                        jnp.int32, (rpt + 2, 128), 1) < (128 - sh)
                    stepped = jnp.where(lane_ok, rolled, rolledc)
                    b = jnp.where(((ph >> k) & 1) != 0, stepped, b)
                rec_out[pl.ds(g * rpt, rpt), :] = jnp.where(
                    ptidx < cnt, b[0:rpt], spat)
            # query tile: field-major slice rotated to the tile start
            phq = s % 128
            t = bufT[bank]
            for k in range(7):
                sh = 1 << k
                # total rotation < 128 and the buffer holds 256 lanes,
                # so lanes [0:128) never wrap past the loaded range
                t = jnp.where(((phq >> k) & 1) != 0,
                              pltpu.roll(t, 256 - sh, 1), t)
            qt_out[:, pl.ds(g * 128, 128)] = jnp.where(
                lane_q < cnt, t[:, 0:128], spatT)

    n_grid = -(-n_tiles // tpb)
    # the grid writes ceil(n_tiles/tpb)*tpb tiles; size the outputs to
    # cover the last block even when slack_tiles < tpb - 1
    nt_out = max(tiles_cap + slack_tiles, n_grid * tpb)

    def call(desc, *recs_args):
        out_shape = [
            jax.ShapeDtypeStruct((8, nt_out * 128), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((8, tpb * 128), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ]
        in_specs = [
            pl.BlockSpec((tpb, DESC_W), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch = [
            pltpu.VMEM((2, 8, 256), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        if build_rec:
            out_shape.insert(0, jax.ShapeDtypeStruct(
                (nt_out * rpt, 128), jnp.int32))
            out_specs.insert(0, pl.BlockSpec(
                (tpb * rpt, 128), lambda t: (t, 0),
                memory_space=pltpu.VMEM))
            in_specs.insert(1, pl.BlockSpec(memory_space=pl.ANY))
            scratch.insert(0, pltpu.VMEM((2, rpt + 2, 128), jnp.int32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret)(desc, *recs_args)
        return out if build_rec else out[0]

    return call


def make_pairs_call(wcap: int, pre_caps, nbr_caps, n_win: int,
                    variable: bool, symmetric: bool,
                    cand_sets=(0,), cand_offsets=(0,),
                    multi_set: bool = False, center_wins: tuple = None,
                    fat_tier: bool = False, interpret: bool = False,
                    pack: int = 1, skip_stage: int = 0,
                    val_bound: int = 1 << 30, tiles_per_step: int = 1,
                    mxu_prefix: bool = DEFAULT_MXU_PREFIX,
                    packed_carry: bool = DEFAULT_PACKED_CARRY,
                    phase_prefix: bool = False,
                    lane_batch: bool = False,
                    shared_blocks: bool = False, orig_bits: int = 31,
                    n_sets_total: int = 1,
                    probe_mode: int = 0, net_cap: int = 0,
                    reduce_fn=None, reduce_n_out: int = 0,
                    reduce_active: tuple = (),
                    mask_mode: bool = False,
                    stage_from_bits: bool = False):
    """Build a pallas_call for one tier.

    Narrow tier (``fat_tier=False``): grid over all tiles; tiles whose
    descriptor FAT_COL is set are skipped (outputs zeroed).
    Fat tier (``fat_tier=True``): grid over a scalar-prefetched tile-id
    list; every listed tile is processed with this (larger) wcap.

    ``pack`` = points per 128-lane record row (1 or a divisor of 16):
    point at padded slot g lives at row g//pack, lanes
    (128//pack)*(g%pack) + field.  Packing divides window DMA traffic and
    VMEM by ``pack`` at the cost of per-phase lane extraction; the
    layout's effective window capacity is wcap - (pack-1) because the DMA
    starts at the row floor of the window's first slot.

    ``pre_caps``: per-window staging widths (tuple of n_win multiples of
    8); the center window typically needs the largest.

    ``cand_sets``: the distinct candidate (set_j) values to emit blocks
    for; ``cand_offsets[b]`` rebases block b's indices to set-local.
    ``nbr_caps``: PER-BLOCK padded-CSR row caps — candidate sets of very
    different density (a dense fluid vs a thin boundary) would otherwise
    all pay the densest set's output footprint (4.8 GB per block at 10M).

    Outputs: ``n_cnt = ceil((n_blocks+2)/8)`` SHARED counts arrays
    followed by one padded-CSR neighbor block per candidate set.  Within
    each tile's 8-row counts group, global row ``b`` holds block b's
    neighbor counts, row ``n_blocks`` the max survivors in the center
    window and row ``n_blocks+1`` the max survivors in any edge window
    (the pre-cap regrow signals, shared across blocks — the host regrow
    takes the max over blocks anyway).  Sharing one (8,TILE) group
    across blocks instead of one per block saves (n_blocks-1) *
    n_tiles*8*TILE*4 bytes — 720 MB at 10M x 3 sets, where the per-block
    counts arrays were the second-largest allocation after the fluid
    neighbor block.
    """
    reduce_mode = reduce_fn is not None
    assert not (reduce_mode and mask_mode)
    if stage_from_bits:
        # SPLIT-STAGING pass 2 (see fastpath split_stage): the geometry
        # masks were computed by a mask-mode pass-1 kernel and arrive as
        # the tile-layout bit-packed ``bits`` input; this kernel only
        # unpacks them, re-DMAs the candidate windows for the orig/set
        # lanes, and runs the staging compaction + merge.  Motivation
        # (benchmarks/NOTES.md round 5): in the fused kernel the staging
        # network costs ~25 ms/step at 1M from a Mosaic scheduling
        # interaction with the surrounding mask pipeline, while the same
        # network standalone costs ~2.9 ms — splitting the passes trades
        # one bits store+load (~2.3 ms at HBM bw) for that interaction.
        # shared_blocks composes: the combined staging consumes the same
        # pm_ph/vo_ph/ws_ph planes stage mode produces.
        assert lane_batch and not probe_mode
        assert not (reduce_mode or mask_mode) and skip_stage == 0
    if reduce_mode or mask_mode:
        # Alternative OUTPUT CONTRACTS that skip the staging compaction +
        # merge (the dominant kernel terms, benchmarks/NOTES.md round 5):
        #  - FUSED NEIGHBOR-REDUCE (the device visitor, see run_reduce):
        #    one f32 output group per tile (reduce_n_out accumulator
        #    rows), no staged CSR blocks.
        #  - MASK MODE (tile-layout bitmask, see run_mask): the per-pair
        #    masks are bit-packed over the pack phases into ONE extra
        #    (n_tiles * n_win*wrows, TILE) i32 output — bit f of row
        #    (t, w*wrows + r) lane l says candidate slot
        #    desc[t,w] + r*pack + f - desc[t,w]%pack neighbors query
        #    lane l of tile t.  Exact per-query counts ride the counts
        #    group.  No compaction, no merge, and NO output caps: mask
        #    mode cannot truncate, so the only regrow signals left are
        #    the prep's (tiles/rows/dense).
        # Both require the lane-batched pipeline.
        assert lane_batch and not shared_blocks and not probe_mode
        assert mask_mode or 1 <= reduce_n_out <= 8
        n_blocks = 0
        n_cnt = 1
        nbr_caps = ()
        # set-mask breadth: reduce_active carries GLOBAL set indices (in
        # sharded raw mode the local cfg sees one set but the records
        # carry data-driven global ids), so the active-matrix mask loops
        # over the widest of the two
        red_nsets = (max(max(i, j) for (i, j) in reduce_active) + 1
                     if reduce_active else 1)
        ns_mask = max(red_nsets, n_sets_total)
    else:
        n_blocks = len(cand_sets)
        n_cnt = (n_blocks + 2 + 7) // 8  # shared counts arrays
        assert len(nbr_caps) == n_blocks \
            and all(k % 8 == 0 for k in nbr_caps)
        assert 1 <= n_blocks <= 8, \
            "pallas kernel supports <= 8 candidate sets"
    out_dt = jnp.float32 if reduce_mode else jnp.int32
    assert n_win <= LENS_OFF, "pallas kernel supports stencil_w <= 3"
    assert 128 % pack == 0 and 128 // pack >= N_FIELDS
    assert wcap % (8 * pack) == 0, "wcap must tile the packed rows"
    pre_caps = tuple(min(pc, wcap) for pc in pre_caps)
    assert len(pre_caps) == n_win and all(pc % 8 == 0 and pc > 0
                                          for pc in pre_caps)
    if center_wins is None:
        center_wins = (n_win // 2,)
    center_wins = tuple(center_wins)
    pc_off = [0]
    for pc in pre_caps:
        pc_off.append(pc_off[-1] + pc)
    m2 = pc_off[-1]
    lpp = 128 // pack          # lanes per point
    wrows = wcap // pack       # DMA rows per window
    # double-buffered window banks: tile g+1's window DMAs are issued
    # before tile g's compute (and tile 0's before the output-init
    # writes), so the per-tile first-window DMA latency hides under the
    # previous tile's VPU work instead of stalling every tile
    n_banks = 1 if (fat_tier or tiles_per_step == 1) else 2

    def _run_pred(desc_ref, row):
        is_fat = desc_ref[row, FAT_COL] != 0
        run = is_fat if fat_tier else jnp.logical_not(is_fat)
        if skip_stage >= 3:     # dev: measure the pure grid/pipeline floor
            run = jnp.bool_(False)
        return run

    def issue(desc_ref, row, rec_ref, win, sems, bank):
        @pl.when(_run_pred(desc_ref, row))
        def _():
            for w in range(n_win):
                dst = win.at[bank, pl.ds(w * wrows, wrows)] if lane_batch \
                    else win.at[bank, w]
                pltpu.make_async_copy(
                    rec_ref.at[pl.ds(desc_ref[row, w] // pack, wrows)],
                    dst, sems.at[bank, w]).start()

    nw8 = -(-n_win // 8) * 8

    def body(desc_ref, row, params_ref, qt_ref, qo, rec_ref, out_refs,
             co, g_out, win, outc, wsc, sems, bank, bits_ref=None):
        # qo/co/no: lane offset into the query block and row offsets into
        # the counts/nbrs output blocks for this tile (several tiles are
        # processed per grid step to amortize the per-step pipeline
        # overhead, measured ~5.6 us/step at 1M)
        r2_fixed = params_ref[0, 0]

        if probe_mode:
            # DEV-ONLY attribution ladder (benchmarks/probe_r5a.py):
            #   1 = window DMAs only, 2 = + per-phase field extracts
            #   (no lane broadcast), 3 = + full mask arithmetic.
            # Results land in the counts row so the calls stay live.
            @pl.when(_run_pred(desc_ref, row))
            def _():
                qx = _f32(qt_ref[F_X:F_X + 1, qo:qo + TILE])
                qy = _f32(qt_ref[F_Y:F_Y + 1, qo:qo + TILE])
                qz = _f32(qt_ref[F_Z:F_Z + 1, qo:qo + TILE])
                q_orig = qt_ref[F_ORIG:F_ORIG + 1, qo:qo + TILE]
                my_r2 = _f32(qt_ref[F_R:F_R + 1, qo:qo + TILE]) ** 2
                sub_c = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0)
                outc[0:wrows, :] = jnp.zeros((wrows, TILE), jnp.int32)

                def _wv(w, lo, hi):
                    # window field slice under either scratch layout
                    if lane_batch:
                        return win[bank, w * wrows:(w + 1) * wrows, lo:hi]
                    return win[bank, w, :, lo:hi]

                for w in range(n_win):
                    dst = win.at[bank, pl.ds(w * wrows, wrows)] \
                        if lane_batch else win.at[bank, w]
                    pltpu.make_async_copy(
                        rec_ref.at[pl.ds(desc_ref[row, w] // pack, wrows)],
                        dst, sems.at[bank, w]).wait()
                    if probe_mode == 1:
                        outc[0:1, :] = outc[0:1, :] + _wv(w, 0, TILE)[0:1, :]
                        continue
                    ln = desc_ref[row, LENS_OFF + w]
                    phase0 = desc_ref[row, w] % pack

                    @pl.when(ln > 0)
                    def _(w=w, ln=ln, phase0=phase0):
                        if probe_mode == 2:
                            a = jnp.zeros((wrows, 1), jnp.int32)
                            for f in range(pack):
                                o = f * lpp
                                a = (a + _wv(w, o + F_X, o + F_X + 1)
                                     + _wv(w, o + F_Y, o + F_Y + 1)
                                     + _wv(w, o + F_Z, o + F_Z + 1)
                                     + _wv(w, o + F_ORIG, o + F_ORIG + 1))
                            outc[0:wrows, :] = outc[0:wrows, :] + a
                            return
                        for f in range(pack):
                            o = f * lpp
                            wx = _f32(_wv(w, o + F_X, o + F_X + 1))
                            wy = _f32(_wv(w, o + F_Y, o + F_Y + 1))
                            wz = _f32(_wv(w, o + F_Z, o + F_Z + 1))
                            wo = _wv(w, o + F_ORIG, o + F_ORIG + 1)
                            ddx = wx - qx
                            ddy = wy - qy
                            ddz = wz - qz
                            d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                            if variable:
                                crit = d2 <= my_r2
                                if symmetric:
                                    wr = _f32(_wv(w, o + F_R, o + F_R + 1))
                                    crit = crit | (d2 <= wr * wr)
                            else:
                                crit = d2 <= r2_fixed
                            off = sub_c * pack + (f - phase0)
                            pm = crit & ((off >= 0) & (off < ln))
                            if w in center_wins:
                                pm = pm & (wo != q_orig)
                            outc[0:wrows, :] = (outc[0:wrows, :]
                                                + pm.astype(jnp.int32))
                out_refs[0][co:co + 1, :] = jnp.sum(
                    outc[0:wrows, :], axis=0, keepdims=True)
            return

        if reduce_mode:
            # FUSED NEIGHBOR-REDUCE: the exact window DMA + mask pipeline
            # of the pairs path (same crit/bounds/self-exclusion, so the
            # visited pair set is bit-identical to run()), but survivor
            # records are never compacted — the user-traced ``reduce_fn``
            # maps each candidate plane to contributions that fold into
            # per-query f32 accumulators.  The staging network, the MXU
            # prefixes and the merge (the dominant kernel terms, see
            # benchmarks/NOTES.md round 5) all disappear.  TPU analog of
            # the reference visitor ``for_each_neighbor``
            # (TreeNSearch.h:221-258) fused into the search itself.
            @pl.when(_run_pred(desc_ref, row))
            def _():
                qx = _f32(qt_ref[F_X:F_X + 1, qo:qo + TILE])
                qy = _f32(qt_ref[F_Y:F_Y + 1, qo:qo + TILE])
                qz = _f32(qt_ref[F_Z:F_Z + 1, qo:qo + TILE])
                q_orig = qt_ref[F_ORIG:F_ORIG + 1, qo:qo + TILE]
                q_set = qt_ref[F_SET:F_SET + 1, qo:qo + TILE]
                my_r2 = _f32(qt_ref[F_R:F_R + 1, qo:qo + TILE]) ** 2
                qp0 = _f32(qt_ref[6:7, qo:qo + TILE])
                qp1 = _f32(qt_ref[7:8, qo:qo + TILE])
                for w in range(n_win):
                    pltpu.make_async_copy(
                        rec_ref.at[pl.ds(desc_ref[row, w] // pack, wrows)],
                        win.at[bank, pl.ds(w * wrows, wrows)],
                        sems.at[bank, w]).wait()
                rows_all = n_win * wrows
                sub_all = jax.lax.broadcasted_iota(
                    jnp.int32, (rows_all, 1), 0)
                wid = sub_all // wrows
                rowmod = sub_all - wid * wrows
                ln_vec = jnp.zeros((rows_all, 1), jnp.int32)
                ph_vec = jnp.zeros((rows_all, 1), jnp.int32)
                for w in range(n_win):
                    sel = wid == w
                    ln_vec = jnp.where(sel, desc_ref[row, LENS_OFF + w],
                                       ln_vec)
                    ph_vec = jnp.where(sel, desc_ref[row, w] % pack,
                                       ph_vec)
                not_center = wid != center_wins[0]
                for cw in center_wins[1:]:
                    not_center = not_center & (wid != cw)
                accs = [jnp.zeros((1, TILE), jnp.float32)
                        for _ in range(reduce_n_out)]
                for f in range(pack):
                    o = f * lpp
                    wx = _f32(win[bank, :, o + F_X:o + F_X + 1])
                    wy = _f32(win[bank, :, o + F_Y:o + F_Y + 1])
                    wz = _f32(win[bank, :, o + F_Z:o + F_Z + 1])
                    wo = win[bank, :, o + F_ORIG:o + F_ORIG + 1]
                    ws = win[bank, :, o + F_SET:o + F_SET + 1]
                    ddx = wx - qx
                    ddy = wy - qy
                    ddz = wz - qz
                    d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                    if variable:
                        crit = d2 <= my_r2
                        if symmetric:
                            wr = _f32(win[bank, :, o + F_R:o + F_R + 1])
                            crit = crit | (d2 <= wr * wr)
                    else:
                        crit = d2 <= r2_fixed
                    off = rowmod * pack + (f - ph_vec)
                    pm = crit & ((off >= 0) & (off < ln_vec))
                    pm = pm & (not_center | (wo != q_orig))
                    # the ACTIVE MATRIX is applied per (query set row x
                    # candidate set) so the reduce folds exactly the pairs
                    # run() would emit — queries of sets with no active
                    # search get 0
                    if ns_mask > 1:
                        am = None
                        for si in range(ns_mask):
                            allowed = tuple(sj for (i, sj) in reduce_active
                                            if i == si)
                            if not allowed:
                                continue
                            rm = ws == allowed[0]
                            for sj in allowed[1:]:
                                rm = rm | (ws == sj)
                            t = (q_set == si) & rm
                            am = t if am is None else (am | t)
                        pm = pm & am
                    env = {
                        "dx": ddx, "dy": ddy, "dz": ddz, "d2": d2,
                        "r2_i": my_r2,
                        "orig_i": q_orig, "orig_j": wo,
                        "set_i": q_set, "set_j": ws,
                        "p0_i": qp0, "p1_i": qp1,
                        "p0_j": _f32(win[bank, :, o + 6:o + 7]),
                        "p1_j": _f32(win[bank, :, o + 7:o + 8]),
                    }
                    if variable:
                        env["r_j"] = _f32(win[bank, :,
                                              o + F_R:o + F_R + 1])
                    outs = reduce_fn(env)
                    if not isinstance(outs, (tuple, list)):
                        outs = (outs,)
                    assert len(outs) == reduce_n_out, \
                        "reduce_fn returned a different arity than n_out"
                    for k in range(reduce_n_out):
                        v = jnp.asarray(outs[k]).astype(jnp.float32)
                        accs[k] = accs[k] + jnp.sum(
                            jnp.where(pm, v, jnp.float32(0.0)),
                            axis=0, keepdims=True)
                for k in range(reduce_n_out):
                    out_refs[0][co + k:co + k + 1, :] = accs[k]
            return

        if mask_mode:
            # MASK MODE: the same window DMA + mask pipeline as run()
            # (same crit/bounds/self-exclusion/active-matrix, so the set
            # bits are bit-identical to the pairs run() emits), but
            # instead of compacting survivors the per-phase masks are
            # OR-packed into one i32 plane (bit f = phase f) and stored
            # in tile layout.  The staging network, MXU prefixes and
            # merge all disappear; the write is raw VMEM->HBM copy.
            mo = g_out * (n_win * wrows)

            @pl.when(_run_pred(desc_ref, row))
            def _():
                qx = _f32(qt_ref[F_X:F_X + 1, qo:qo + TILE])
                qy = _f32(qt_ref[F_Y:F_Y + 1, qo:qo + TILE])
                qz = _f32(qt_ref[F_Z:F_Z + 1, qo:qo + TILE])
                q_orig = qt_ref[F_ORIG:F_ORIG + 1, qo:qo + TILE]
                q_set = qt_ref[F_SET:F_SET + 1, qo:qo + TILE]
                my_r2 = _f32(qt_ref[F_R:F_R + 1, qo:qo + TILE]) ** 2
                for w in range(n_win):
                    pltpu.make_async_copy(
                        rec_ref.at[pl.ds(desc_ref[row, w] // pack, wrows)],
                        win.at[bank, pl.ds(w * wrows, wrows)],
                        sems.at[bank, w]).wait()
                rows_all = n_win * wrows
                sub_all = jax.lax.broadcasted_iota(
                    jnp.int32, (rows_all, 1), 0)
                wid = sub_all // wrows
                rowmod = sub_all - wid * wrows
                ln_vec = jnp.zeros((rows_all, 1), jnp.int32)
                ph_vec = jnp.zeros((rows_all, 1), jnp.int32)
                for w in range(n_win):
                    sel = wid == w
                    ln_vec = jnp.where(sel, desc_ref[row, LENS_OFF + w],
                                       ln_vec)
                    ph_vec = jnp.where(sel, desc_ref[row, w] % pack,
                                       ph_vec)
                not_center = wid != center_wins[0]
                for cw in center_wins[1:]:
                    not_center = not_center & (wid != cw)
                bits = jnp.zeros((rows_all, TILE), jnp.int32)
                cnt = jnp.zeros((1, TILE), jnp.int32)
                for f in range(pack):
                    o = f * lpp
                    wx = _f32(win[bank, :, o + F_X:o + F_X + 1])
                    wy = _f32(win[bank, :, o + F_Y:o + F_Y + 1])
                    wz = _f32(win[bank, :, o + F_Z:o + F_Z + 1])
                    wo = win[bank, :, o + F_ORIG:o + F_ORIG + 1]
                    ddx = wx - qx
                    ddy = wy - qy
                    ddz = wz - qz
                    d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                    if variable:
                        crit = d2 <= my_r2
                        if symmetric:
                            wr = _f32(win[bank, :, o + F_R:o + F_R + 1])
                            crit = crit | (d2 <= wr * wr)
                    else:
                        crit = d2 <= r2_fixed
                    off = rowmod * pack + (f - ph_vec)
                    pm = crit & ((off >= 0) & (off < ln_vec))
                    pm = pm & (not_center | (wo != q_orig))
                    if ns_mask > 1:
                        ws = win[bank, :, o + F_SET:o + F_SET + 1]
                        am = None
                        for si in range(ns_mask):
                            allowed = tuple(sj for (i, sj) in reduce_active
                                            if i == si)
                            if not allowed:
                                continue
                            rm = ws == allowed[0]
                            for sj in allowed[1:]:
                                rm = rm | (ws == sj)
                            t = (q_set == si) & rm
                            am = t if am is None else (am | t)
                        pm = pm & am
                    pmi = pm.astype(jnp.int32)
                    bits = bits | (pmi << f)
                    cnt = cnt + jnp.sum(pmi, axis=0, keepdims=True)
                out_refs[0][co:co + 1, :] = cnt
                out_refs[1][mo:mo + rows_all, :] = bits
            return

        if lane_batch:
            # v5 LANE-BATCHED tile pipeline (round 4).  The r4 attribution
            # ladder (benchmarks/probe_r5a.out) showed the kernel is
            # dominated by per-WINDOW fixed costs, not element work:
            # field extracts ~20 ms (144 lane slices/tile), MXU prefixes
            # ~12 ms (36 tiny matmuls/tile), window compaction ~29 ms
            # (9 roll networks/tile) — while DMA is ~5 ms.  This branch
            # amortizes all three 9x by batching windows:
            #   - ONE contiguous window buffer (n_win*wrows, 128): each
            #     field is extracted once per phase on the full buffer
            #     (16 slices/tile instead of 144);
            #   - masks are re-blocked windows-on-LANES (wrows, n_win*128)
            #     per phase, so the per-phase prefix is ONE
            #     (wrows, wrows) @ (wrows, n_win*128) matmul — same MACs,
            #     1/n_win the launches (the r3 plane-merge attempt merged
            #     along SUBLANES and paid m^2 prefix growth; lanes don't);
            #   - ONE compaction network over (wcap, n_win*128) — same
            #     element work as n_win small networks, 1/n_win the
            #     per-step overhead; each lane block compacts its own
            #     window independently (no cross-window collisions).
            # Per-window staging slices and the analytic merge are
            # unchanged, so the staged bytes and final output are
            # bit-identical to the per-window path (tests/test_pallas.py).
            @pl.when(_run_pred(desc_ref, row))
            def _():
                wsc[:, :] = jnp.zeros((n_blocks * nw8, TILE), jnp.int32)
                rows_all = n_win * wrows

                def _wait_windows():
                    for w in range(n_win):
                        pltpu.make_async_copy(
                            rec_ref.at[pl.ds(desc_ref[row, w] // pack,
                                             wrows)],
                            win.at[bank, pl.ds(w * wrows, wrows)],
                            sems.at[bank, w]).wait()
                ones_t = jnp.ones((1, TILE), jnp.int32)
                if stage_from_bits:
                    _wait_windows()
                    # pass 2: the geometry/bounds/self-exclusion masks are
                    # already bit-packed in the bits input (bit f = pack
                    # phase f, written by the mask-mode pass 1); only the
                    # orig/set lanes are read from the re-DMA'd windows
                    bits = bits_ref[g_out * rows_all:
                                    (g_out + 1) * rows_all, :]
                    pm_ph, vo_ph, ws_ph = [], [], []
                    for f in range(pack):
                        o = f * lpp
                        wo = win[bank, :, o + F_ORIG:o + F_ORIG + 1]
                        pm_ph.append((bits & (1 << f)) != 0)
                        vo_ph.append(wo * ones_t)
                        if multi_set:
                            ws_ph.append(win[bank, :,
                                             o + F_SET:o + F_SET + 1])
                else:
                    qx = _f32(qt_ref[F_X:F_X + 1, qo:qo + TILE])
                    qy = _f32(qt_ref[F_Y:F_Y + 1, qo:qo + TILE])
                    qz = _f32(qt_ref[F_Z:F_Z + 1, qo:qo + TILE])
                    q_orig = qt_ref[F_ORIG:F_ORIG + 1, qo:qo + TILE]
                    my_r2 = _f32(qt_ref[F_R:F_R + 1, qo:qo + TILE]) ** 2
                    _wait_windows()
                    sub_all = jax.lax.broadcasted_iota(
                        jnp.int32, (rows_all, 1), 0)
                    wid = sub_all // wrows
                    rowmod = sub_all - wid * wrows
                    # per-window scalars spread to lane-invariant rows
                    ln_vec = jnp.zeros((rows_all, 1), jnp.int32)
                    ph_vec = jnp.zeros((rows_all, 1), jnp.int32)
                    for w in range(n_win):
                        sel = wid == w
                        ln_vec = jnp.where(sel,
                                           desc_ref[row, LENS_OFF + w],
                                           ln_vec)
                        ph_vec = jnp.where(sel, desc_ref[row, w] % pack,
                                           ph_vec)
                    not_center = wid != center_wins[0]
                    for cw in center_wins[1:]:
                        not_center = not_center & (wid != cw)

                    pm_ph, vo_ph, ws_ph = [], [], []
                    for f in range(pack):
                        o = f * lpp
                        wx = _f32(win[bank, :, o + F_X:o + F_X + 1])
                        wy = _f32(win[bank, :, o + F_Y:o + F_Y + 1])
                        wz = _f32(win[bank, :, o + F_Z:o + F_Z + 1])
                        wo = win[bank, :, o + F_ORIG:o + F_ORIG + 1]
                        ddx = wx - qx
                        ddy = wy - qy
                        ddz = wz - qz
                        d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                        if variable:
                            crit = d2 <= my_r2
                            if symmetric:
                                wr = _f32(
                                    win[bank, :, o + F_R:o + F_R + 1])
                                crit = crit | (d2 <= wr * wr)
                        else:
                            crit = d2 <= r2_fixed
                        # NOTE (r4 measured): moving the validity into
                        # NaN-poisoned coords and the center
                        # self-exclusion into a sentinel orig SAVES VPU
                        # ops on paper but cost +11 ms/step at 1M on v5e
                        # (bench_r7e_v2off vs bench_r7_row_base) — the
                        # poison chain serializes against the distance
                        # pipeline.  Keep the full-width AND/OR form.
                        off = rowmod * pack + (f - ph_vec)
                        pm = crit & ((off >= 0) & (off < ln_vec))
                        pm = pm & (not_center | (wo != q_orig))
                        pm_ph.append(pm)
                        if skip_stage < 1:
                            vo_ph.append(wo * ones_t)
                        if multi_set:
                            ws_ph.append(win[bank, :,
                                             o + F_SET:o + F_SET + 1])

                def _reblock(x):
                    # (n_win*wrows, TILE) windows-on-sublanes ->
                    # (wrows, n_win*TILE) windows-on-lane-blocks
                    return jnp.concatenate(
                        [x[w * wrows:(w + 1) * wrows, :]
                         for w in range(n_win)], axis=1)

                out_w = max(pre_caps)
                if shared_blocks and skip_stage < 1:
                    # SHARED-COMPACTION multi-block path: the candidate-set
                    # blocks' masks are DISJOINT (a candidate belongs to
                    # exactly one set), yet the per-block loop below runs a
                    # full-volume prefix + compaction network PER BLOCK —
                    # the dominant kernel term at 10M x 3 sets.  Instead:
                    # ONE combined pass compacts (set_id << orig_bits |
                    # orig) for ALL candidate sets together, then each
                    # block extracts its rows from the (much smaller)
                    # staged buffer with its own MXU prefix — the
                    # full-volume network is paid once instead of
                    # n_blocks times.  Gated host-side on the packed
                    # encoding fitting int32 (_pallas_search).
                    need_filter = set(cand_sets) != set(range(n_sets_total))
                    parts = []
                    run = None
                    mfs, pks = [], []
                    tri = None
                    for f in range(pack):
                        pmf = pm_ph[f]
                        if need_filter:
                            # candidates of sets that are not candidate
                            # sets would pollute the combined staging
                            allow = ws_ph[f] == cand_sets[0]
                            for sj in cand_sets[1:]:
                                allow = allow | (ws_ph[f] == sj)
                            pmf = pmf & allow
                        mf = _reblock(pmf)
                        # packed (set << orig_bits | orig): the (rows, 1)
                        # set column broadcasts against the full-width
                        # value plane
                        pk = _reblock((ws_ph[f] << orig_bits) | vo_ph[f])
                        if tri is None:
                            r_i = jax.lax.broadcasted_iota(
                                jnp.int32, (wrows, wrows), 0)
                            c_i = jax.lax.broadcasted_iota(
                                jnp.int32, (wrows, wrows), 1)
                            tri = (r_i >= c_i).astype(jnp.bfloat16)
                        pf = jax.lax.dot_general(
                            tri, mf.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
                        if run is not None:
                            pf = pf + run
                        parts.append(pf)
                        run = pf[wrows - 1:wrows, :]
                        mfs.append(mf)
                        pks.append(pk)
                    prefix = parts[0] if pack == 1 else \
                        jnp.concatenate(parts, axis=0)
                    wsum_w = run
                    # combined center/edge staging-truncation signals
                    c_sig = wsum_w[:, center_wins[0] * TILE:
                                   (center_wins[0] + 1) * TILE]
                    for cw in center_wins[1:]:
                        c_sig = jnp.maximum(
                            c_sig, wsum_w[:, cw * TILE:(cw + 1) * TILE])
                    e_sig = jnp.zeros((1, TILE), jnp.int32)
                    for w in range(n_win):
                        if w in center_wins:
                            continue
                        e_sig = jnp.maximum(
                            e_sig, wsum_w[:, w * TILE:(w + 1) * TILE])
                    for sig, srow in ((c_sig, n_blocks),
                                      (e_sig, n_blocks + 1)):
                        sref = out_refs[srow // 8]
                        sb = co + srow % 8
                        sref[sb:sb + 1, :] = jnp.maximum(
                            sref[sb:sb + 1, :], sig)
                    mask_all = jnp.concatenate(mfs, axis=0) if pack > 1 \
                        else mfs[0]
                    packed = jnp.concatenate(pks, axis=0) if pack > 1 \
                        else pks[0]
                    staged = _compact_sub(
                        mask_all, packed, out_w, p=prefix,
                        mxu_prefix=True, packed_carry=False,
                        strides_cap=net_cap)
                    for w in range(n_win):
                        outc[pc_off[w]:pc_off[w + 1], :] = \
                            staged[:pre_caps[w], w * TILE:(w + 1) * TILE]
                    # per-block second stage over the staged buffer:
                    # extract + front-pack this block's rows and its
                    # counts; replaces both the per-block full networks
                    # and the analytic merge
                    st_v = outc[0:m2, :]
                    for b in range(n_blocks):
                        # invalid staged slots are -1: arithmetic >> keeps
                        # them -1, which never equals a candidate set id
                        keep_b = (st_v >> orig_bits) == cand_sets[b]
                        p_b = _mask_prefix_mxu(keep_b)
                        cnt_b = p_b[m2 - 1:m2, :]
                        cref = out_refs[b // 8]
                        cb = co + b % 8
                        cref[cb:cb + 1, :] = cref[cb:cb + 1, :] + cnt_b
                        vals_b = (st_v & ((1 << orig_bits) - 1)) \
                            - cand_offsets[b]
                        k_out = min(nbr_caps[b], m2)
                        no = g_out * nbr_caps[b]
                        out_refs[n_cnt + b][no:no + k_out, :] = \
                            _compact_sub(keep_b, vals_b, k_out, p=p_b,
                                         val_bound=val_bound,
                                         mxu_prefix=True,
                                         packed_carry=False)
                    return
                V = None
                tri = None
                for b in range(n_blocks):
                    parts, mfs = [], []
                    run = None
                    for f in range(pack):
                        pmf = pm_ph[f] & (ws_ph[f] == cand_sets[b]) \
                            if multi_set else pm_ph[f]
                        mf = _reblock(pmf)
                        if tri is None:
                            r_i = jax.lax.broadcasted_iota(
                                jnp.int32, (wrows, wrows), 0)
                            c_i = jax.lax.broadcasted_iota(
                                jnp.int32, (wrows, wrows), 1)
                            tri = (r_i >= c_i).astype(jnp.bfloat16)
                        pf = jax.lax.dot_general(
                            tri, mf.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
                        if run is not None:
                            pf = pf + run
                        parts.append(pf)
                        run = pf[wrows - 1:wrows, :]
                        mfs.append(mf)
                    prefix = parts[0] if pack == 1 else \
                        jnp.concatenate(parts, axis=0)
                    wsum_w = run            # (1, n_win*TILE) window totals
                    # per-block counts: sum the window lane blocks
                    cnt = wsum_w[:, 0:TILE]
                    for w in range(1, n_win):
                        cnt = cnt + wsum_w[:, w * TILE:(w + 1) * TILE]
                    cref = out_refs[b // 8]
                    cb = co + b % 8
                    cref[cb:cb + 1, :] = cref[cb:cb + 1, :] + cnt
                    # center/edge pre-cap regrow signals (shared rows)
                    c_sig = wsum_w[:, center_wins[0] * TILE:
                                   (center_wins[0] + 1) * TILE]
                    for cw in center_wins[1:]:
                        c_sig = jnp.maximum(
                            c_sig, wsum_w[:, cw * TILE:(cw + 1) * TILE])
                    e_sig = jnp.zeros((1, TILE), jnp.int32)
                    for w in range(n_win):
                        if w in center_wins:
                            continue
                        e_sig = jnp.maximum(
                            e_sig, wsum_w[:, w * TILE:(w + 1) * TILE])
                    for sig, srow in ((c_sig, n_blocks),
                                      (e_sig, n_blocks + 1)):
                        sref = out_refs[srow // 8]
                        sb = co + srow % 8
                        sref[sb:sb + 1, :] = jnp.maximum(
                            sref[sb:sb + 1, :], sig)
                    for w in range(n_win):
                        wsc[b * nw8 + w:b * nw8 + w + 1, :] = \
                            wsum_w[:, w * TILE:(w + 1) * TILE]
                    if skip_stage >= 1:
                        outc[b * m2:(b + 1) * m2, :] = jnp.full(
                            (m2, TILE), -1, jnp.int32)
                        continue
                    mask_all = mfs[0] if pack == 1 else \
                        jnp.concatenate(mfs, axis=0)
                    if V is None:
                        vs = [_reblock(v) for v in vo_ph]
                        V = vs[0] if pack == 1 else \
                            jnp.concatenate(vs, axis=0)
                    vals_b = V - cand_offsets[b] if cand_offsets[b] \
                        else V
                    staged = _compact_sub(
                        mask_all, vals_b, out_w, p=prefix,
                        val_bound=val_bound,
                        mxu_prefix=True, packed_carry=False,
                        strides_cap=net_cap)
                    for w in range(n_win):
                        outc[b * m2 + pc_off[w]:
                             b * m2 + pc_off[w + 1], :] = \
                            staged[:pre_caps[w],
                                   w * TILE:(w + 1) * TILE]

                if skip_stage < 2:
                    _merge(out_refs, outc, wsc, g_out)
            return

        @pl.when(_run_pred(desc_ref, row))
        def _():
            # per-(block, window) survivor counts: the merge's analytic
            # displacement needs the running sum in window order
            wsc[:, :] = jnp.zeros((n_blocks * nw8, TILE), jnp.int32)
            # record arrays are int32-typed (coords as f32 bit patterns):
            # integer moves never flush the denormal patterns small
            # indices would have as floats (see ops/fastpath.py)
            qx = _f32(qt_ref[F_X:F_X + 1, qo:qo + TILE])
            qy = _f32(qt_ref[F_Y:F_Y + 1, qo:qo + TILE])
            qz = _f32(qt_ref[F_Z:F_Z + 1, qo:qo + TILE])
            q_orig = qt_ref[F_ORIG:F_ORIG + 1, qo:qo + TILE]
            my_r2 = _f32(qt_ref[F_R:F_R + 1, qo:qo + TILE]) ** 2

            # row-vector iota: the in-window validity range depends only
            # on the candidate ROW, so it is computed lane-invariant and
            # broadcast into the mask (1 AND/elem instead of ~5 ops/elem)
            sub_c = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0)

            def _emit(w, masks, all_ws, mask_geo, wo_b):
                """Per-block counts, regrow signals and staged compaction
                for one window, given its geometry mask(s)."""
                surv_row = 1 if w in center_wins else 2
                for b in range(n_blocks):
                    if multi_set:
                        pms = [mf & (wf == cand_sets[b])
                               for mf, wf in zip(masks, all_ws)]
                        pm = pms[0] if len(pms) == 1 else \
                            jnp.concatenate(pms, axis=0)
                    else:
                        pms = masks
                        pm = mask_geo
                    if mxu_prefix and phase_prefix and len(pms) > 1:
                        # per-PHASE prefixes + running offsets: the
                        # tril matmul is O(m^2 q), so pack phase
                        # pieces cost 1/pack the MACs of one big one
                        run, parts = None, []
                        for pmf in pms:
                            pf = _mask_prefix_mxu(pmf)
                            if run is not None:
                                pf = pf + run
                            parts.append(pf)
                            run = pf[pmf.shape[0] - 1:, :]
                        prefix = jnp.concatenate(parts, axis=0)
                        wsum = run
                    elif mxu_prefix:
                        prefix = _mask_prefix_mxu(pm)
                        wsum = prefix[mask_geo.shape[0] - 1:, :]
                    else:
                        prefix = None
                        wsum = jnp.sum(pm.astype(jnp.int32), axis=0,
                                       keepdims=True)
                    cref = out_refs[b // 8]
                    cb = co + b % 8
                    cref[cb:cb + 1, :] = cref[cb:cb + 1, :] + wsum
                    # shared rows n_blocks/n_blocks+1: max center/
                    # edge window survivors (pre-cap regrow signals)
                    sr = n_blocks + surv_row - 1
                    sref = out_refs[sr // 8]
                    sb = co + sr % 8
                    sref[sb:sb + 1, :] = jnp.maximum(
                        sref[sb:sb + 1, :], wsum)
                    wsc[b * nw8 + w:b * nw8 + w + 1, :] = wsum
                    if skip_stage < 1:  # dev knob: stage attribution
                        outc[b * m2 + pc_off[w]:
                             b * m2 + pc_off[w + 1], :] = \
                            _compact_sub(pm, wo_b - cand_offsets[b],
                                         pre_caps[w], p=prefix,
                                         val_bound=val_bound,
                                         mxu_prefix=mxu_prefix,
                                         packed_carry=packed_carry)

            for w in range(n_win):
                # wait per window right before its use: the DMA engine
                # streams windows w+1.. while the VPU processes window w
                pltpu.make_async_copy(
                    rec_ref.at[pl.ds(desc_ref[row, w] // pack, wrows)],
                    win.at[bank, w], sems.at[bank, w]).wait()
                ln = desc_ref[row, LENS_OFF + w]
                phase0 = desc_ref[row, w] % pack  # first slot's lane group

                # the compact write below covers the window's whole
                # staging slice (-1 for unfilled rows), so the explicit
                # fill is only needed when the window is empty/skipped
                if skip_stage >= 1:
                    for b in range(n_blocks):
                        outc[b * m2 + pc_off[w]:
                             b * m2 + pc_off[w + 1], :] = \
                            jnp.full((pre_caps[w], TILE), -1, jnp.int32)
                else:
                    @pl.when(ln == 0)
                    def _(w=w):
                        for b in range(n_blocks):
                            outc[b * m2 + pc_off[w]:
                                 b * m2 + pc_off[w + 1], :] = \
                                jnp.full((pre_caps[w], TILE), -1, jnp.int32)

                @pl.when(ln > 0)
                def _(w=w, ln=ln, phase0=phase0):
                    ones_t = jnp.ones((1, TILE), jnp.int32)
                    masks, all_vals = [], []
                    if multi_set:
                        all_ws = []
                    for f in range(pack):
                        o = f * lpp
                        wx = _f32(win[bank, w, :, o + F_X:o + F_X + 1])
                        wy = _f32(win[bank, w, :, o + F_Y:o + F_Y + 1])
                        wz = _f32(win[bank, w, :, o + F_Z:o + F_Z + 1])
                        wo = win[bank, w, :, o + F_ORIG:o + F_ORIG + 1]

                        ddx = wx - qx
                        ddy = wy - qy
                        ddz = wz - qz
                        d2 = (ddx * ddx + ddy * ddy) + ddz * ddz
                        if variable:
                            crit = d2 <= my_r2
                            if symmetric:
                                wr = _f32(win[bank, w, :, o + F_R:o + F_R + 1])
                                crit = crit | (d2 <= wr * wr)
                        else:
                            crit = d2 <= r2_fixed
                        # windows of distinct (di, dj) are disjoint sorted
                        # ranges, so d^2 <= r^2 is exact: no cell-
                        # membership recompute (r1's in_stencil) needed.
                        # in-window offset of (row s, lane group f):
                        # s*pack + f - phase0 in [0, ln)  (lane-invariant)
                        off = sub_c * pack + (f - phase0)
                        pm = crit & ((off >= 0) & (off < ln))
                        if w in center_wins:
                            # the query's own record can only appear in
                            # the center windows of its own tile (other
                            # windows are different grid rows); sentinel-
                            # sentinel pairs fail on NaN coords everywhere
                            pm = pm & (wo != q_orig)
                        masks.append(pm)
                        # broadcast to full lane width BEFORE the phase
                        # concat: Mosaic cannot concatenate single-lane
                        # vectors whose lane offsets differ
                        all_vals.append(wo * ones_t)
                        if multi_set:
                            all_ws.append(
                                win[bank, w, :, o + F_SET:o + F_SET + 1]
                                * ones_t)
                    if pack == 1:
                        mask_geo, wo_b = masks[0], all_vals[0]
                    else:
                        mask_geo = jnp.concatenate(masks, axis=0)
                        wo_b = jnp.concatenate(all_vals, axis=0)
                    _emit(w, masks, all_ws if multi_set else None,
                          mask_geo, wo_b)

            if skip_stage < 2:
                _merge(out_refs, outc, wsc, g_out)

    def _merge(out_refs, outc, wsc, g_out):
        for b in range(n_blocks):
            merged = outc[b * m2:(b + 1) * m2, :]
            # ANALYTIC merge positions: each window's staging is
            # front-packed, so staged row (w, i) is the i-th
            # survivor of window w and its global position is
            # sum of earlier windows' staged counts + i + 1 — no
            # (m2, m2) prefix matmul.  min() against pre_caps
            # keeps the positions consistent under truncation
            # (truncated runs are discarded by the pre_surv
            # regrow signal, but stay well-formed).
            run = jnp.zeros((1, TILE), jnp.int32)
            p_parts = []
            for w in range(n_win):
                sw = jnp.minimum(
                    wsc[b * nw8 + w:b * nw8 + w + 1, :],
                    pre_caps[w])
                io = jax.lax.broadcasted_iota(
                    jnp.int32, (pre_caps[w], 1), 0)
                p_parts.append(io + (run + 1))
                run = run + sw
            p_m = p_parts[0] if n_win == 1 else \
                jnp.concatenate(p_parts, axis=0)
            # block rows beyond each cap stay -1
            k_out = min(nbr_caps[b], m2)
            no = g_out * nbr_caps[b]
            out_refs[n_cnt + b][no:no + k_out, :] = _compact_sub(
                merged >= 0, merged, k_out, p=p_m,
                val_bound=val_bound,
                mxu_prefix=mxu_prefix, packed_carry=packed_carry)

    G = 1 if fat_tier else tiles_per_step

    def _init_outs(out_refs):
        if skip_stage >= 4:   # dev: measure the pure pipeline (no writes)
            return
        for c in range(n_cnt):
            out_refs[c][:, :] = jnp.zeros((8 * G, TILE), out_dt)
        if mask_mode:
            # skipped (fat-routed) tiles decode as empty; the fat tier's
            # own mask block supplies their bits (tier select at decode)
            out_refs[1][:, :] = jnp.zeros((n_win * wrows * G, TILE),
                                          jnp.int32)
        for b in range(n_blocks):
            # the nbr block needs no -1 fill on the fast path: the merge
            # writes rows [0, min(cap, m2)) for every processed tile
            # (counts <= m2 by the pre_cap regrow contract) and skipped
            # tiles' rows are never consumed (tier selection at gather);
            # attribution modes skip the merge, so fill then for
            # determinism
            if 1 <= skip_stage or min(nbr_caps[b], m2) < nbr_caps[b]:
                out_refs[n_cnt + b][:, :] = jnp.full(
                    (nbr_caps[b] * G, TILE), -1, jnp.int32)

    n_out_arrays = n_cnt + n_blocks + (1 if mask_mode else 0)

    if fat_tier:
        def kernel(ids_ref, desc_ref, params_ref, qt_ref, rec_ref,
                   *rest):
            if stage_from_bits:
                bits_ref, rest = rest[0], rest[1:]
            else:
                bits_ref = None
            out_refs = rest[:n_out_arrays]
            win, outc, wsc, sems = rest[n_out_arrays:]
            row = ids_ref[pl.program_id(0)] % 8
            issue(desc_ref, row, rec_ref, win, sems, 0)
            _init_outs(out_refs)
            body(desc_ref, row, params_ref, qt_ref, 0, rec_ref, out_refs,
                 0, 0, win, outc, wsc, sems, 0, bits_ref=bits_ref)
    else:
        assert G in (1, 2, 4, 8)
        spb = 8 // G  # grid steps sharing one 8-row descriptor block

        def kernel(desc_ref, params_ref, qt_ref, rec_ref, *rest):
            if stage_from_bits:
                bits_ref, rest = rest[0], rest[1:]
            else:
                bits_ref = None
            out_refs = rest[:n_out_arrays]
            win, outc, wsc, sems = rest[n_out_arrays:]
            if G == 8:
                rows = list(range(8))
                issue(desc_ref, rows[0], rec_ref, win, sems, 0)
            elif G == 1:
                rows = [pl.program_id(0) % spb]
                issue(desc_ref, rows[0], rec_ref, win, sems, 0)
            else:
                pid = pl.program_id(0)
                sub = pid % spb
                base = sub * G
                rows = [base + g for g in range(G)]
                # steps past the first of each descriptor block had their
                # first tile cross-step-prefetched by the previous step
                @pl.when(sub == 0)
                def _():
                    issue(desc_ref, rows[0], rec_ref, win, sems, 0)
            _init_outs(out_refs)
            for g in range(G):
                if g + 1 < G:
                    issue(desc_ref, rows[g + 1], rec_ref, win, sems,
                          (g + 1) % n_banks)
                elif G in (2, 4):
                    # cross-step prefetch: the next grid step's first tile
                    # sits in the same descriptor block unless this step
                    # is the block's last; G even => its bank is always 0.
                    # Gate on a next step existing so no DMA is left
                    # unawaited at kernel exit.
                    nxt = base + G
                    ok = (nxt < 8) & (pl.program_id(0) + 1
                                      < pl.num_programs(0))

                    @pl.when(ok)
                    def _():
                        issue(desc_ref, nxt, rec_ref, win, sems, 0)
                body(desc_ref, rows[g], params_ref, qt_ref, g * TILE,
                     rec_ref, out_refs, g * 8, g,
                     win, outc, wsc, sems, g % n_banks,
                     bits_ref=bits_ref)

    scratch = [
        # lane_batch stages all windows contiguously (one buffer per bank)
        pltpu.VMEM((n_banks, n_win * wrows, 128), jnp.int32) if lane_batch
        else pltpu.VMEM((n_banks, n_win, wrows, 128), jnp.int32),
        pltpu.VMEM((max(n_blocks * m2, 8), TILE), jnp.int32),
        pltpu.VMEM((max(n_blocks * nw8, 8), TILE), jnp.int32),
        pltpu.SemaphoreType.DMA((n_banks, n_win)),
    ]

    def call(n_tiles, desc, params, q_t, rec, ids=None, bits=None):
        # n_tiles tiles total; the narrow tier runs G of them per grid step
        assert fat_tier or n_tiles % G == 0
        assert (bits is not None) == stage_from_bits
        n_grid = n_tiles if fat_tier else n_tiles // G
        out_shape = [jax.ShapeDtypeStruct((n_tiles * 8, TILE), out_dt)
                     for _ in range(n_cnt)]
        for b in range(n_blocks):
            out_shape.append(jax.ShapeDtypeStruct(
                (n_tiles * nbr_caps[b], TILE), jnp.int32))
        if mask_mode:
            out_shape.append(jax.ShapeDtypeStruct(
                (n_tiles * n_win * wrows, TILE), jnp.int32))
        if fat_tier:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_grid,),
                in_specs=[
                    pl.BlockSpec((8, DESC_W),
                                 lambda t, ids: (ids[t] // 8, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, DESC_W), lambda t, ids: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((N_FIELDS, TILE),
                                 lambda t, ids: (0, ids[t]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ] + ([pl.BlockSpec((n_win * wrows, TILE),
                                   lambda t, ids: (t, 0),
                                   memory_space=pltpu.VMEM)]
                     if stage_from_bits else []),
                out_specs=[pl.BlockSpec((8, TILE),
                                        lambda t, ids: (t, 0),
                                        memory_space=pltpu.VMEM)
                           for _ in range(n_cnt)] + [
                    pl.BlockSpec((nbr_caps[b], TILE),
                                 lambda t, ids: (t, 0),
                                 memory_space=pltpu.VMEM)
                    for b in range(n_blocks)] + ([
                    pl.BlockSpec((n_win * wrows, TILE),
                                 lambda t, ids: (t, 0),
                                 memory_space=pltpu.VMEM)]
                    if mask_mode else []),
                scratch_shapes=scratch,
            )
            args = (ids, desc, params, q_t, rec) + \
                ((bits,) if stage_from_bits else ())
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret)(*args)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec((8, DESC_W), lambda t: (t // (8 // G), 0)
                             if G < 8 else (t, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, DESC_W), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N_FIELDS, G * TILE), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ] + ([pl.BlockSpec((n_win * wrows * G, TILE),
                               lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
                 if stage_from_bits else []),
            out_specs=[pl.BlockSpec((8 * G, TILE), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(n_cnt)] + [
                pl.BlockSpec((nbr_caps[b] * G, TILE), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
                for b in range(n_blocks)] + ([
                pl.BlockSpec((n_win * wrows * G, TILE), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
                if mask_mode else []),
            scratch_shapes=scratch,
        )
        args = (desc, params, q_t, rec) + \
            ((bits,) if stage_from_bits else ())
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret)(*args)

    return call
