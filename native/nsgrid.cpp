// nsgrid — native CPU uniform-grid neighbor search for treensearch_tpu.
//
// Role: the runtime's native component (the reference library's runtime is
// all C++; SURVEY.md §2).  Used as (a) a fast large-N oracle for parity
// validation where the O(n^2) numpy oracle is infeasible, and (b) a CPU
// fallback engine.  It is an independent design, NOT a port of the
// reference octree: a flat uniform grid with sorted linear cell ids,
// per-cell ranges by binary search, and a 27-cell scan — the same
// sort-based formulation as the TPU pipeline (ops/pipeline.py), which also
// makes it a structural cross-check of that design.
//
// C ABI (ctypes): all memory owned by the caller except the neighbor
// buffer, which is allocated here and freed with nsgrid_free.
//
// Semantics match the reference oracle (tests/BruteforceNSearch.cpp:66-105):
// inclusive d^2 <= r^2 in float32, self-exclusion by index, variable radii
// with optional symmetric OR rule.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct SortedGrid {
    std::vector<int64_t> cell_of;   // sorted linear cell id per slot
    std::vector<int32_t> order;     // slot -> original point index
    double min[3];
    double inv_cell;
    int64_t dims[3];
};

void build_grid(const float* pts, int64_t n, float cell, SortedGrid& g) {
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            double v = pts[3 * i + d];
            lo[d] = std::min(lo[d], v);
            hi[d] = std::max(hi[d], v);
        }
    g.inv_cell = 1.0 / cell;
    for (int d = 0; d < 3; ++d) {
        g.min[d] = lo[d];
        g.dims[d] = n ? std::max<int64_t>(
            1, (int64_t)std::floor((hi[d] - lo[d]) * g.inv_cell) + 1) : 1;
    }
    g.cell_of.resize(n);
    g.order.resize(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t c[3];
        for (int d = 0; d < 3; ++d) {
            int64_t q = (int64_t)std::floor(
                (pts[3 * i + d] - g.min[d]) * g.inv_cell);
            c[d] = std::clamp<int64_t>(q, 0, g.dims[d] - 1);
        }
        g.cell_of[i] = (c[0] * g.dims[1] + c[1]) * g.dims[2] + c[2];
        g.order[i] = (int32_t)i;
    }
    std::sort(g.order.begin(), g.order.end(),
              [&](int32_t a, int32_t b) { return g.cell_of[a] < g.cell_of[b]; });
    std::vector<int64_t> sorted(n);
    for (int64_t s = 0; s < n; ++s) sorted[s] = g.cell_of[g.order[s]];
    g.cell_of.swap(sorted);
}

}  // namespace

extern "C" {

// Fixed or variable radius search of one (set_i -> set_j) pair.
//   pts_i (n_i*3), pts_j (n_j*3): float32 xyz
//   radii_i/radii_j: per-point radii or nullptr (then use radius)
//   reach_extra: extra stencil reach; in symmetric variable mode pass the
//     global max radius of set_j so far-away large-radius candidates are
//     visited (role of the reference's node-max-radius ghost width,
//     TreeNSearch.cpp:1457-1466); else 0
//   symmetric: OR rule (only meaningful with radii)
//   same_set: self-exclusion by index applies
// Outputs: counts (n_i, preallocated by caller) and *out_nbrs: a heap
// buffer of concatenated neighbor lists (CSR by prefix-summing counts).
// Returns total neighbor entries, or -1 on error.
int64_t nsgrid_search(const float* pts_i, int64_t n_i,
                      const float* pts_j, int64_t n_j,
                      const float* radii_i, const float* radii_j,
                      float radius, float reach_extra, float cell,
                      int symmetric, int same_set,
                      int32_t* counts, int32_t** out_nbrs) {
    if (n_i < 0 || n_j < 0 || cell <= 0) return -1;
    SortedGrid g;
    build_grid(pts_j, n_j, cell, g);

    int n_threads = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::vector<int32_t>> tl_nbrs(n_threads);
    std::vector<std::vector<int64_t>> tl_rows(n_threads);

    auto worker = [&](int t) {
        auto& nbrs = tl_nbrs[t];
        auto& rows = tl_rows[t];
        for (int64_t i = t; i < n_i; i += n_threads) {
            const float xi = pts_i[3 * i], yi = pts_i[3 * i + 1],
                        zi = pts_i[3 * i + 2];
            const float ri = radii_i ? radii_i[i] : radius;
            const float ri2 = ri * ri;
            // stencil wide enough for both own radius and (symmetric mode)
            // the largest candidate radius (reach_extra)
            const float reach = std::max(ri, reach_extra);
            const int64_t w = std::max<int64_t>(
                1, (int64_t)std::ceil(reach * g.inv_cell));
            int64_t c[3];
            for (int d = 0; d < 3; ++d) {
                const float v = d == 0 ? xi : (d == 1 ? yi : zi);
                c[d] = std::clamp<int64_t>(
                    (int64_t)std::floor((v - g.min[d]) * g.inv_cell),
                    -w, g.dims[d] - 1 + w);
            }
            rows.push_back(i);
            rows.push_back((int64_t)nbrs.size());
            int64_t cnt = 0;
            for (int64_t di = -w; di <= w; ++di) {
                const int64_t ii = c[0] + di;
                if (ii < 0 || ii >= g.dims[0]) continue;
                for (int64_t dj = -w; dj <= w; ++dj) {
                    const int64_t jj = c[1] + dj;
                    if (jj < 0 || jj >= g.dims[1]) continue;
                    const int64_t k0 = std::max<int64_t>(0, c[2] - w);
                    const int64_t k1 = std::min<int64_t>(g.dims[2] - 1,
                                                         c[2] + w);
                    if (k0 > k1) continue;
                    const int64_t base = (ii * g.dims[1] + jj) * g.dims[2];
                    auto lo_it = std::lower_bound(
                        g.cell_of.begin(), g.cell_of.end(), base + k0);
                    auto hi_it = std::upper_bound(
                        lo_it, g.cell_of.end(), base + k1);
                    for (auto it = lo_it; it != hi_it; ++it) {
                        const int64_t s = it - g.cell_of.begin();
                        const int32_t j = g.order[s];
                        if (same_set && j == i) continue;
                        const float dx = pts_j[3 * j] - xi;
                        const float dy = pts_j[3 * j + 1] - yi;
                        const float dz = pts_j[3 * j + 2] - zi;
                        const float d2 = (dx * dx + dy * dy) + dz * dz;
                        bool ok = d2 <= ri2;
                        if (!ok && radii_j && symmetric) {
                            const float rj = radii_j[j];
                            ok = d2 <= rj * rj;
                        }
                        if (ok) {
                            nbrs.push_back(j);
                            ++cnt;
                        }
                    }
                }
            }
            counts[i] = (int32_t)cnt;
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();

    // stitch per-thread results into CSR order
    int64_t total = 0;
    for (int64_t i = 0; i < n_i; ++i) total += counts[i];
    int32_t* out = (int32_t*)std::malloc(std::max<int64_t>(total, 1) *
                                         sizeof(int32_t));
    if (!out) return -1;
    std::vector<int64_t> offs(n_i + 1, 0);
    for (int64_t i = 0; i < n_i; ++i) offs[i + 1] = offs[i] + counts[i];
    for (int t = 0; t < n_threads; ++t) {
        const auto& rows = tl_rows[t];
        const auto& nbrs = tl_nbrs[t];
        for (size_t r = 0; r + 1 < rows.size(); r += 2) {
            const int64_t i = rows[r];
            const int64_t src = rows[r + 1];
            std::memcpy(out + offs[i], nbrs.data() + src,
                        counts[i] * sizeof(int32_t));
        }
    }
    *out_nbrs = out;
    return total;
}

void nsgrid_free(int32_t* p) { std::free(p); }

}  // extern "C"
