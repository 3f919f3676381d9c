"""Neighbor-list views over the padded-CSR device solution.

The reference exposes results as zero-copy ``NeighborList`` handles over
``[count, n0, n1, ...]`` int records (``NeighborList.h:8-39``) plus a
``for_each_neighbor`` visitor (``TreeNSearch.h:433-441``).  Here the device
solution is padded-CSR — per active pair (set_i, set_j): ``counts`` (n_i,)
and ``nbrs`` (n_i, cap) with -1 padding — and these classes provide the
same ergonomic handles on the host, fetching each pair's arrays from the
device at most once.

TPU-native consumers should skip the handles and use
``NeighborSolution.get_neighbors()`` to keep everything on device.
"""

from __future__ import annotations

import numpy as np


class NeighborList:
    """Handle to the neighbors in set_j of one point of set_i.

    Mirrors ``tns::NeighborList`` (``NeighborList.h:8-39``): ``size()``,
    ``operator[]``, iteration.  Indices are local to set_j and unsorted,
    like the reference's SIMD output.
    """

    __slots__ = ("_ids",)

    def __init__(self, ids: np.ndarray):
        self._ids = ids

    def size(self) -> int:
        return int(self._ids.shape[0])

    def __len__(self) -> int:
        return self.size()

    def __getitem__(self, k: int) -> int:
        return int(self._ids[k])

    def __iter__(self):
        return iter(self._ids.tolist())

    def to_numpy(self) -> np.ndarray:
        return self._ids

    def __repr__(self):
        return f"NeighborList(n={self.size()})"


class NeighborSolution:
    """Host-side view of one run's results for all active pairs."""

    def __init__(self, pairs_device: dict, nbr_cap: int):
        # pairs_device: {"si-sj": {"counts": dev, "nbrs": dev, ...}}
        self._dev = pairs_device
        self._np_cache: dict = {}
        self._counts_cache: dict = {}
        self.nbr_cap = nbr_cap

    def _materialized(self, p: dict):
        """Per-point padded rows; the pallas solution stores tile-layout
        records + a per-point pointer (reference solution_ptr analog) and
        materializes the (n, cap) view once, on first access."""
        if "nbrs" not in p:
            from .ops.fastpath import materialize_nbrs
            p["nbrs"] = materialize_nbrs(p)
        return p["nbrs"]

    def _fetch(self, si: int, sj: int):
        key = f"{si}-{sj}"
        if key not in self._np_cache:
            if key not in self._dev:
                raise KeyError(
                    f"search ({si} -> {sj}) is not active; activate it with "
                    "set_active_search before run()")
            p = self._dev[key]
            self._np_cache[key] = (np.asarray(p["counts"]),
                                   np.asarray(self._materialized(p)))
        return self._np_cache[key]

    def get_neighborlist(self, si: int, sj: int, i: int) -> NeighborList:
        counts, nbrs = self._fetch(si, sj)
        return NeighborList(nbrs[i, : counts[i]])

    def get_counts(self, si: int, sj: int) -> np.ndarray:
        """Counts WITHOUT materializing the neighbor rows (the per-point
        view of a dense pair is GBs at 10M; stats/diagnostics only need
        counts)."""
        key = f"{si}-{sj}"
        if key in self._np_cache:
            return self._np_cache[key][0]
        if key not in self._counts_cache:
            if key not in self._dev:
                raise KeyError(f"search ({si} -> {sj}) is not active")
            self._counts_cache[key] = np.asarray(self._dev[key]["counts"])
        return self._counts_cache[key]

    def get_padded(self, si: int, sj: int) -> np.ndarray:
        return self._fetch(si, sj)[1]

    def get_neighbors_device(self, si: int, sj: int):
        """Device (counts, padded nbrs) — the TPU-native bulk interface."""
        key = f"{si}-{sj}"
        if key not in self._dev:
            raise KeyError(f"search ({si} -> {sj}) is not active")
        p = self._dev[key]
        return p["counts"], self._materialized(p)

    def n_bytes(self) -> int:
        """Memory of the per-point neighbor lists, reference
        ``get_neighborlist_n_bytes`` (``TreeNSearch.cpp:254-261``).

        For tile-layout (Pallas) pairs this reports the per-point VIEW
        size (counts + n x cap rows) — the same meaning as the
        reference's list bytes — not the internal tile-record storage,
        which is shared across pairs and sized by the tile caps."""
        total = 0
        for p in self._dev.values():
            total += p["counts"].size * 4
            if "nbrs" in p:
                total += p["nbrs"].size * 4
            else:
                n = p["qpos"].shape[0]
                cap = p["nbrs_tiles"].shape[1]
                total += n * cap * 4
        return total
