// Native host kernels for the marching-cubes sparse phase.
//
// The reference's meshing is a single-threaded C# loop with rolling
// face-layer dedup (MarchingCubes.cs:53-80, Cell.cs:123-143). Our host phase
// replaced it with vectorized numpy (mesh/marching_cubes.py _sparse_phase);
// these C++ kernels replace the two numpy hot spots — vertex welding and
// gradient-normal accumulation — with single-pass loops: numpy needs ~8
// full-array passes (unique, argsort, rank scatter, 4 fancy gathers,
// multiply-adds, np.add.at) where one cache-resident pass suffices. Exposed
// with a plain C ABI and loaded via ctypes (no pybind11 in this image).
//
// Semantics are pinned to the numpy implementations in
// tests/test_native.py: weld() reproduces the np.unique + first-occurrence
// ranking exactly (integer outputs, bitwise); grad_edges() accumulates the
// same per-reference contributions (float rounding may differ from numpy's
// multiplicity-compressed order at the ulp level; both paths are
// deterministic).

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <vector>

extern "C" {

// Vertex welding: given per-stream-entry canonical keys, emit
//   vertex_id[i] = rank of entry i's key, ranks ordered by first occurrence
//   rep[v]       = stream index of the first occurrence of vertex v
// Returns the number of unique keys (vertices). Equivalent to:
//   uniq, first_idx, inv = np.unique(keys, return_index=True,
//                                    return_inverse=True)
//   order = np.argsort(first_idx); rank[order] = arange
//   vertex_id = rank[inv]; rep = first_idx[order]
int64_t weld_i64(const int64_t* keys, int64_t n, int32_t* vertex_id,
                 int64_t* rep) {
    std::vector<int64_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    // Sort by (key, index): groups come out key-ordered with the first
    // occurrence leading each group.
    std::sort(idx.begin(), idx.end(), [keys](int64_t a, int64_t b) {
        return keys[a] != keys[b] ? keys[a] < keys[b] : a < b;
    });
    // Group id per entry (key-sorted numbering) + first occurrence of each.
    std::vector<int32_t> group(n);
    std::vector<int64_t> first;
    first.reserve(1024);
    int32_t g = -1;
    int64_t prev_key = 0;
    for (int64_t k = 0; k < n; ++k) {
        int64_t i = idx[k];
        if (g < 0 || keys[i] != prev_key) {
            ++g;
            prev_key = keys[i];
            first.push_back(i);  // min index in group (sorted by idx within)
        }
        group[i] = g;
    }
    int64_t n_verts = static_cast<int64_t>(first.size());
    // Rank groups by first occurrence.
    std::vector<int64_t> order(n_verts);
    for (int64_t v = 0; v < n_verts; ++v) order[v] = v;
    std::sort(order.begin(), order.end(), [&first](int64_t a, int64_t b) {
        return first[a] < first[b];
    });
    std::vector<int32_t> rank(n_verts);
    for (int64_t r = 0; r < n_verts; ++r) {
        rank[order[r]] = static_cast<int32_t>(r);
        rep[r] = first[order[r]];
    }
    for (int64_t i = 0; i < n; ++i) vertex_id[i] = rank[group[i]];
    return n_verts;
}

// Gradient-normal accumulation over edge-vertex face references
// (Cell.AddFaceFromEdgeIndex gradient side, Cell.cs:314-333, including the
// packed-index-into-MC-numbered-vg quirk; see _sparse_phase). One pass:
// for each stream entry, the two endpoint inverse-|value| weights scale the
// MC-numbered corner gradients indexed by PACKED offset, accumulated into
// the entry's welded vertex.
//   evi:   (n)   uint8  edge index 0..11
//   ecell: (n)   int64  active-cell column
//   vid:   (n)   int32  welded vertex id
//   v8:    (8,m) float64 iso-subtracted corner values (MC numbering)
//   vg:    (8,m,3) float32 corner gradients (MC numbering, packed-indexed)
//   p1,p2,mc1,mc2: (12) int8 LUTs (packed offsets / MC corners per edge)
//   normals: (n_verts,3) float32, accumulated in place
void grad_edges(const uint8_t* evi, const int64_t* ecell, const int32_t* vid,
                int64_t n, const double* v8, const float* vg, int64_t m,
                const int8_t* p1, const int8_t* p2, const int8_t* mc1,
                const int8_t* mc2, double eps, float* normals) {
    for (int64_t i = 0; i < n; ++i) {
        const int e = evi[i];
        const int64_t c = ecell[i];
        const double va = v8[static_cast<int64_t>(mc1[e]) * m + c];
        const double vb = v8[static_cast<int64_t>(mc2[e]) * m + c];
        const float t1 = static_cast<float>(1.0 / (eps + std::fabs(va)));
        const float t2 = static_cast<float>(1.0 / (eps + std::fabs(vb)));
        const float* g1 = vg + (static_cast<int64_t>(p1[e]) * m + c) * 3;
        const float* g2 = vg + (static_cast<int64_t>(p2[e]) * m + c) * 3;
        float* out = normals + static_cast<int64_t>(vid[i]) * 3;
        out[0] += g1[0] * t1 + g2[0] * t2;
        out[1] += g1[1] * t1 + g2[1] * t2;
        out[2] += g1[2] * t1 + g2[2] * t2;
    }
}

}  // extern "C"
