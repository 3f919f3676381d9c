"""Tile-layout bitmask contract at 1M: the zero-compaction output.

`run_mask` / `make_step_fn(mask_output=True)` returns the pair masks
bit-packed in the kernel's native tile layout instead of compacted
per-point CSR lists: the staging networks, MXU prefixes and the merge —
the measured-dominant kernel terms at 1M (NOTES.md round 5: staging
~28 ms + merge ~4.4 ms in situ) — never run, replaced by a raw
~0.9 GB/step bitmask store at HBM copy bandwidth.  This measures the
end-to-end step against the same 1M config as bench.py, on both the
temporal-coherence carry step and the forced-rebuild step.

Exactness: a sampled set of tiles is decoded on the host with the
reference decoder (ops.fastpath.decode_mask) and compared as exact sets
against the neighbor lists run() emits; per-point counts are compared
over ALL queries.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_INTERPRET"):  # CPU dry-run of the script
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from treensearch_tpu import TreeNSearch
from treensearch_tpu.ops.fastpath import decode_mask

N = int(os.environ.get("BENCH_N", 1_000_000))
R = float(os.environ.get("BENCH_R", 0.02))
ITERS = int(os.environ.get("BENCH_ITERS", 50))
SAMPLE_TILES = int(os.environ.get("BENCH_SAMPLE_TILES", 40))


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    eng = TreeNSearch()
    eng.add_point_set(pts)
    eng.set_search_radius(R)
    eng.set_all_searches(True)
    eng.set_cell_size(float(os.environ.get("BENCH_CELLF", 1.15)) * R)
    eng.set_record_pack(int(os.environ.get("BENCH_PACK", 8)))
    if "BENCH_WCAP" in os.environ:   # 10M-scale runs pin wcap to bound
        eng.set_window_cap(int(os.environ["BENCH_WCAP"]))  # the bits HBM
    if "BENCH_TILES" in os.environ:
        eng._tiles_cap = int(os.environ["BENCH_TILES"])
    if "BENCH_FATCAP" in os.environ:
        eng._fat_cap = int(os.environ["BENCH_FATCAP"])
    if os.environ.get("BENCH_INTERPRET"):
        eng.set_use_pallas(True, interpret=True)

    eng.prepare_zsort()
    pts = np.asarray(eng.apply_zsort(0, pts))
    eng.resize_point_set(0, pts)

    # settle caps on the mask path; pull the mask pytree to HOST numpy so
    # its device buffers (9.7 GB of bits at 10M) are freed before the
    # CSR validation program allocates its blocks
    mask, meta = eng.run_mask()
    mask = jax.tree.map(np.asarray, mask)

    # ---- exactness vs the neighbor-list path ---------------------------
    eng.run()
    counts_l, nbrs_l = eng.get_neighbors(0, 0)
    counts_l = np.asarray(counts_l)
    nbrs_l = np.asarray(nbrs_l)
    eng._solution = None   # free the CSR device blocks before timing
    total_pairs = int(counts_l.sum())
    cnt_mask = np.asarray(mask["counts"]["s0"])
    ok_counts = np.array_equal(cnt_mask, counts_l)
    print(f"[validate] mask counts == run() counts over all {N} queries: "
          f"{ok_counts}", file=sys.stderr)

    from treensearch_tpu.ops.pallas_pairs import FAT_COL
    n_tiles = int(np.asarray(mask["bits_tiles"]).shape[0])
    # sample OCCUPIED tiles (dead layout-padding tiles carry FAT_COL=2
    # and decode to nothing)
    occ = np.nonzero(np.asarray(mask["desc"])[:n_tiles, FAT_COL] != 2)[0]
    tiles = rng.choice(occ, min(SAMPLE_TILES, len(occ)), replace=False)
    _, dec = decode_mask(mask, meta, tiles=tiles)
    ok_sets = len(dec) > 0
    n_checked = 0
    for qi, got in dec.items():
        exp = np.sort(nbrs_l[qi][:counts_l[qi]])
        if not np.array_equal(got, exp):
            ok_sets = False
            print(f"  MISMATCH query {qi}", file=sys.stderr)
            break
        n_checked += 1
    print(f"[validate] decoded sets exact on {n_checked} queries "
          f"({len(tiles)} tiles): {ok_sets}", file=sys.stderr)

    points_dev = jnp.asarray(pts)

    def time_leg(reuse: bool, tag: str):
        # reuse=False: the step fn rebuilds the cell structure every step;
        # reuse=True: temporal-coherence carry.  Both legs THREAD the
        # state through the loop so no iteration is loop-invariant (an
        # earlier version closed over a constant state in the rebuild
        # leg, which XLA could hoist).
        step, st = eng.make_step_fn(mask_output=True, reuse=reuse)

        @jax.jit
        def loop(points, state):
            def body(_, carry):
                state, acc = carry
                sol, state = step(state, points)
                acc = acc + sol["mask"]["counts_flat"][::4097].sum() \
                    + sol["mask"]["bits_tiles"][0, 0, 0]
                return state, acc
            return jax.lax.fori_loop(0, ITERS, body,
                                     (state, jnp.int32(0)))

        st2, acc = loop(points_dev, st)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        st2, acc = loop(points_dev, st)
        int(acc)
        return (time.perf_counter() - t0) / ITERS

    dt_carry = time_leg(True, "carry")
    print(f"[mask carry-reuse] {dt_carry * 1e3:.2f} ms/step",
          file=sys.stderr)
    dt_rebuild = time_leg(False, "rebuild")
    print(f"[mask rebuild] {dt_rebuild * 1e3:.2f} ms/step",
          file=sys.stderr)

    print(json.dumps({
        "metric": "mask_contract_1m",
        "value": total_pairs / dt_carry,
        "unit": "pairs/s",
        "vs_baseline": (total_pairs / dt_carry) / 1.03e8,
        "ms_per_step": dt_carry * 1e3,
        "ms_per_step_rebuild": dt_rebuild * 1e3,
        "total_pairs": total_pairs,
        "n_points": N,
        "validated": bool(ok_counts and ok_sets),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
