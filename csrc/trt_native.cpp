// Native host runtime for tryraytrace_tpu.
//
// The reference's runtime around its GPU kernel is C++ (OBJ parsing
// loader.cpp, PPM tonemap image_io.cpp/pipeline.cpp, BVH build
// bvh.cpp); this library provides the equivalents for the TPU build,
// exposed through a C ABI consumed via ctypes (tryraytrace_tpu/native.py).
// Every function mirrors the exact semantics of its Python fallback so
// the two paths are interchangeable.
//
// Build: make -C csrc   (g++ -O3 -march=native -fopenmp, shared lib)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// OBJ parser: only "v x y z" and "f i j k" lines; sscanf-parity face
// acceptance (first two index tokens must be pure ints, third needs a
// leading int); malformed vertex components become 0.0 but keep their
// index slot; out-of-range faces are skipped.  (loader.cpp:22-103)
// ---------------------------------------------------------------------

static bool parse_float(const char*& p, float& out) {
    char* end = nullptr;
    float v = strtof(p, &end);
    if (end == p) return false;
    p = end;
    out = v;
    return true;
}

// Pure integer token: optional sign, digits, then whitespace/EOL.
static bool parse_pure_int(const char*& p, long& out) {
    while (*p == ' ' || *p == '\t') p++;
    char* end = nullptr;
    long v = strtol(p, &end, 10);
    if (end == p) return false;
    if (*end != '\0' && *end != ' ' && *end != '\t' &&
        *end != '\n' && *end != '\r') return false;
    p = end;
    out = v;
    return true;
}

// Leading integer token (suffix like "/3" allowed -- sscanf reads the
// int and the next conversion would fail, but for the *third* index
// nothing follows, so a leading int suffices).
static bool parse_leading_int(const char*& p, long& out) {
    while (*p == ' ' || *p == '\t') p++;
    char* end = nullptr;
    long v = strtol(p, &end, 10);
    if (end == p) return false;
    p = end;
    out = v;
    return true;
}

int trt_parse_obj(const char* path, float* verts, int32_t* faces,
                  int64_t cap, int64_t* n_verts, int64_t* n_faces) {
    FILE* f = fopen(path, "r");
    if (!f) return -1;
    // getline: whole lines regardless of length, matching the Python
    // fallback (a fixed fgets buffer would split overlong lines into
    // pseudo-lines and could fabricate phantom vertices).
    char* line = nullptr;
    size_t line_cap = 0;
    int64_t nv = 0, nf = 0;
    while (getline(&line, &line_cap, f) != -1) {
        if (line[0] == 'v' && line[1] == ' ') {
            if (nv >= cap) { free(line); fclose(f); return -2; }
            const char* p = line + 2;
            float xyz[3] = {0.f, 0.f, 0.f};
            for (int k = 0; k < 3; k++) {
                while (*p == ' ' || *p == '\t') p++;
                if (!parse_float(p, xyz[k])) break;
            }
            verts[nv * 3 + 0] = xyz[0];
            verts[nv * 3 + 1] = xyz[1];
            verts[nv * 3 + 2] = xyz[2];
            nv++;
        } else if (line[0] == 'f' && line[1] == ' ') {
            const char* p = line + 2;
            long i0, i1, i2;
            if (!parse_pure_int(p, i0)) continue;
            if (!parse_pure_int(p, i1)) continue;
            if (!parse_leading_int(p, i2)) continue;
            if (i0 < 1 || i0 > nv || i1 < 1 || i1 > nv ||
                i2 < 1 || i2 > nv) continue;  // loader.cpp:71-74
            if (nf >= cap) { free(line); fclose(f); return -2; }
            faces[nf * 3 + 0] = (int32_t)(i0 - 1);
            faces[nf * 3 + 1] = (int32_t)(i1 - 1);
            faces[nf * 3 + 2] = (int32_t)(i2 - 1);
            nf++;
        }
    }
    free(line);
    fclose(f);
    *n_verts = nv;
    *n_faces = nf;
    return 0;
}

// ---------------------------------------------------------------------
// Tonemap: average + gamma 1/2.2 quantize (common.h:126-128,
// image_io.cpp:53-68, pipeline.cpp:59-71).  OpenMP static schedule
// like the reference.
// ---------------------------------------------------------------------

static inline int to_int(float x) {
    x = x < 0.f ? 0.f : (x > 1.f ? 1.f : x);
    return (int)(powf(x, 1.0f / 2.2f) * 255.0f + 0.5f);
}

void trt_tonemap(const float* accum, uint8_t* out, int64_t n_pixels,
                 float inv_frame) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_pixels; i++) {
        out[i * 3 + 0] = (uint8_t)to_int(accum[i * 3 + 0] * inv_frame);
        out[i * 3 + 1] = (uint8_t)to_int(accum[i * 3 + 1] * inv_frame);
        out[i * 3 + 2] = (uint8_t)to_int(accum[i * 3 + 2] * inv_frame);
    }
}

void trt_tonemap_argb(const float* accum, uint32_t* out, int64_t n_pixels,
                      float inv_frame) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_pixels; i++) {
        uint32_t r = (uint32_t)to_int(accum[i * 3 + 0] * inv_frame);
        uint32_t g = (uint32_t)to_int(accum[i * 3 + 1] * inv_frame);
        uint32_t b = (uint32_t)to_int(accum[i * 3 + 2] * inv_frame);
        out[i] = (255u << 24) | (r << 16) | (g << 8) | b;  // 0xAARRGGBB
    }
}

// ---------------------------------------------------------------------
// BVH build: top-down median split by count on the longest axis of the
// node bounds, stable centroid sort, singleton leaves, preorder node
// emission with miss links (bvh.cpp:32-113 + the threaded-link
// extension in accel/bvh.py).  Mirrors the Python builder exactly:
// same float comparisons, stable sort.
// ---------------------------------------------------------------------

struct BuildCtx {
    const float* cent;        // [n, 3]
    const float* pb;          // [n, 6]
    std::vector<int64_t> order;
    float* node_bounds;       // [2n-1, 6]
    int32_t* leaf_prim;
    int32_t* miss;
    int32_t* axis;            // optional (may be null)
    int64_t next_node = 0;
};

struct Frame { int64_t start, end; int32_t miss_link; };

int64_t trt_bvh_build(const float* centroids, int64_t n,
                      const float* prim_bounds, int32_t* perm,
                      float* node_bounds, int32_t* leaf_prim,
                      int32_t* miss, int32_t* axis_out) {
    if (n <= 0) return 0;
    const int64_t m = 2 * n - 1;
    BuildCtx ctx;
    ctx.cent = centroids;
    ctx.pb = prim_bounds;
    ctx.order.resize(n);
    std::iota(ctx.order.begin(), ctx.order.end(), (int64_t)0);
    ctx.node_bounds = node_bounds;
    ctx.leaf_prim = leaf_prim;
    ctx.miss = miss;
    ctx.axis = axis_out;

    std::vector<Frame> stack;
    stack.push_back({0, n, (int32_t)m});
    while (!stack.empty()) {
        Frame fr = stack.back();
        stack.pop_back();
        int64_t idx = ctx.next_node++;
        float lo[3] = {1e30f, 1e30f, 1e30f};
        float hi[3] = {-1e30f, -1e30f, -1e30f};
        for (int64_t i = fr.start; i < fr.end; i++) {
            const float* b = ctx.pb + ctx.order[i] * 6;
            for (int k = 0; k < 3; k++) {
                lo[k] = std::min(lo[k], b[k]);
                hi[k] = std::max(hi[k], b[3 + k]);
            }
        }
        for (int k = 0; k < 3; k++) {
            node_bounds[idx * 6 + k] = lo[k];
            node_bounds[idx * 6 + 3 + k] = hi[k];
        }
        miss[idx] = fr.miss_link;
        if (fr.end - fr.start == 1) {
            leaf_prim[idx] = (int32_t)fr.start;
            if (axis_out) axis_out[idx] = 0;
            continue;
        }
        leaf_prim[idx] = -1;
        // Longest-axis pick with the reference's tie-break
        // (bvh.cpp:76-79).
        float size[3] = {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]};
        int ax = 0;
        if (size[1] > size[0]) ax = 1;
        if (size[2] > size[1] && size[2] > size[0]) ax = 2;
        if (axis_out) axis_out[idx] = ax;
        const float* cent = ctx.cent;
        std::stable_sort(ctx.order.begin() + fr.start,
                         ctx.order.begin() + fr.end,
                         [cent, ax](int64_t a, int64_t b) {
                             return cent[a * 3 + ax] < cent[b * 3 + ax];
                         });
        int64_t mid = fr.start + (fr.end - fr.start) / 2;
        int32_t right_idx = (int32_t)(idx + 2 * (mid - fr.start));
        stack.push_back({mid, fr.end, fr.miss_link});
        stack.push_back({fr.start, mid, right_idx});
    }
    for (int64_t i = 0; i < n; i++) perm[i] = (int32_t)ctx.order[i];
    return m;
}

// ---------------------------------------------------------------------
// Binned-SAH build with fat leaves: the production builder
// (accel/bvh.py _build_sah), mirrored operation-for-operation so the
// trees are bit-identical to the NumPy implementation (same float32
// geometry arithmetic, same float64 cost comparisons under NumPy-2
// promotion, same stable partition, same preorder flatten).
// Replaces the recursive reference builder (bvh.cpp:47-113) the same
// way the Python one does -- SAH split instead of median, leaves up to
// leaf_size primitives for the fused-row traversal.
// ---------------------------------------------------------------------

namespace {

struct SahTmp {             // temporary child-linked tree
    std::vector<float> lo, hi;           // [m,3] each
    std::vector<int32_t> left, right, axis;
    std::vector<int64_t> start, count;   // count>0 => leaf
};

inline float half_area_f(const float* lo, const float* hi) {
    float d0 = std::max(hi[0] - lo[0], 0.0f);
    float d1 = std::max(hi[1] - lo[1], 0.0f);
    float d2 = std::max(hi[2] - lo[2], 0.0f);
    return d0 * d1 + d1 * d2 + d2 * d0;  // same op order as NumPy
}

struct SahCtx {
    const float* cent;   // [n,3]
    const float* pb;     // [n,6] (lo, hi)
    std::vector<int64_t> order;
    SahTmp t;
    int64_t leaf_size;
    int n_bins;
    double c_trav, c_isect;
};

int32_t sah_rec(SahCtx& c, int64_t start, int64_t end) {
    const int n_bins = c.n_bins;
    int32_t idx = (int32_t)c.t.lo.size() / 3;
    float lo[3] = {INFINITY, INFINITY, INFINITY};
    float hi[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int64_t i = start; i < end; i++) {
        const float* b = c.pb + c.order[i] * 6;
        for (int k = 0; k < 3; k++) {
            lo[k] = std::min(lo[k], b[k]);
            hi[k] = std::max(hi[k], b[3 + k]);
        }
    }
    for (int k = 0; k < 3; k++) { c.t.lo.push_back(lo[k]); c.t.hi.push_back(hi[k]); }
    c.t.left.push_back(-1);
    c.t.right.push_back(-1);
    c.t.axis.push_back(0);
    c.t.start.push_back(start);
    c.t.count.push_back(end - start);
    const int64_t m = end - start;
    if (m <= 1) return idx;

    float clo[3] = {INFINITY, INFINITY, INFINITY};
    float chi[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int64_t i = start; i < end; i++) {
        const float* p = c.cent + c.order[i] * 3;
        for (int k = 0; k < 3; k++) {
            clo[k] = std::min(clo[k], p[k]);
            chi[k] = std::max(chi[k], p[k]);
        }
    }

    bool have_best = false;
    double best_cost = 0.0;
    int best_ax = 0, best_split = 0;
    std::vector<int32_t> bins(m), best_bins;
    for (int ax = 0; ax < 3; ax++) {
        float extent = chi[ax] - clo[ax];
        if (!(extent > 0)) continue;  // NumPy: skip when extent <= 0
        int64_t counts[64] = {0};
        float blo[64][3], bhi[64][3];
        for (int b = 0; b < n_bins; b++)
            for (int k = 0; k < 3; k++) { blo[b][k] = INFINITY; bhi[b][k] = -INFINITY; }
        for (int64_t i = 0; i < m; i++) {
            const float* p = c.cent + c.order[start + i] * 3;
            // float32 arithmetic then trunc-to-int, exactly as
            // ((c - clo) / extent * n_bins).astype(int64)
            float v = (p[ax] - clo[ax]) / extent * (float)n_bins;
            int32_t b = (int32_t)v;
            if (b > n_bins - 1) b = n_bins - 1;
            bins[i] = b;
            counts[b]++;
            const float* pbq = c.pb + c.order[start + i] * 6;
            for (int k = 0; k < 3; k++) {
                blo[b][k] = std::min(blo[b][k], pbq[k]);
                bhi[b][k] = std::max(bhi[b][k], pbq[3 + k]);
            }
        }
        for (int split = 1; split < n_bins; split++) {
            int64_t nl = 0;
            for (int b = 0; b < split; b++) nl += counts[b];
            int64_t nr = m - nl;
            if (nl == 0 || nr == 0) continue;
            float llo[3] = {INFINITY, INFINITY, INFINITY};
            float lhi[3] = {-INFINITY, -INFINITY, -INFINITY};
            float rlo[3] = {INFINITY, INFINITY, INFINITY};
            float rhi[3] = {-INFINITY, -INFINITY, -INFINITY};
            for (int b = 0; b < split; b++)
                for (int k = 0; k < 3; k++) {
                    llo[k] = std::min(llo[k], blo[b][k]);
                    lhi[k] = std::max(lhi[k], bhi[b][k]);
                }
            for (int b = split; b < n_bins; b++)
                for (int k = 0; k < 3; k++) {
                    rlo[k] = std::min(rlo[k], blo[b][k]);
                    rhi[k] = std::max(rhi[k], bhi[b][k]);
                }
            // NumPy-2: float32 half-areas promote with int64 counts to
            // float64, so the comparison runs in double.
            double cost = (double)half_area_f(llo, lhi) * (double)nl
                        + (double)half_area_f(rlo, rhi) * (double)nr;
            if (!have_best || cost < best_cost) {
                have_best = true;
                best_cost = cost;
                best_ax = ax;
                best_split = split;
                best_bins = bins;
            }
        }
    }

    float parent_area = half_area_f(lo, hi);
    double leaf_cost = c.c_isect * (double)m;
    double split_cost = INFINITY;
    if (have_best && parent_area > 0)
        split_cost = c.c_trav + c.c_isect * best_cost / (double)parent_area;
    if (m <= c.leaf_size && (!have_best || split_cost >= leaf_cost))
        return idx;  // SAH says leaf (fits a fat-leaf row)

    int64_t mid;
    if (!have_best) {
        mid = start + m / 2;  // all centroids identical: even split
    } else {
        c.t.axis[idx] = best_ax;
        // Stable partition by bins < split, same as the boolean-mask
        // indexing in NumPy (order preserved on both sides).
        std::vector<int64_t> lseg, rseg;
        lseg.reserve(m);
        for (int64_t i = 0; i < m; i++)
            (best_bins[i] < best_split ? lseg : rseg)
                .push_back(c.order[start + i]);
        if (lseg.empty() || rseg.empty()) {
            mid = start + m / 2;  // degenerate: even split, no reorder
        } else {
            std::copy(lseg.begin(), lseg.end(), c.order.begin() + start);
            std::copy(rseg.begin(), rseg.end(),
                      c.order.begin() + start + (int64_t)lseg.size());
            mid = start + (int64_t)lseg.size();
        }
    }
    int32_t l = sah_rec(c, start, mid);
    int32_t r = sah_rec(c, mid, end);
    c.t.left[idx] = l;
    c.t.right[idx] = r;
    c.t.count[idx] = 0;
    return idx;
}

int64_t subtree_size(const SahTmp& t, int32_t tid) {
    // Iterative subtree node count (matches accel/bvh.py _subtree_size).
    int64_t total = 0;
    std::vector<int32_t> st{tid};
    while (!st.empty()) {
        int32_t x = st.back();
        st.pop_back();
        total++;
        if (t.count[x] == 0) { st.push_back(t.left[x]); st.push_back(t.right[x]); }
    }
    return total;
}

}  // namespace

int64_t trt_bvh_build_sah(const float* centroids, int64_t n,
                          const float* prim_bounds, int64_t leaf_size,
                          int32_t n_bins, double c_trav, double c_isect,
                          int32_t* perm, float* node_bounds,
                          int32_t* leaf_prim, int32_t* leaf_count,
                          int32_t* miss, int32_t* left_out,
                          int32_t* right_out, int32_t* axis_out) {
    if (n <= 0 || n_bins < 2 || n_bins > 64) return 0;
    SahCtx c;
    c.cent = centroids;
    c.pb = prim_bounds;
    c.order.resize(n);
    std::iota(c.order.begin(), c.order.end(), (int64_t)0);
    c.leaf_size = leaf_size;
    c.n_bins = n_bins;
    c.c_trav = c_trav;
    c.c_isect = c_isect;
    sah_rec(c, 0, n);

    // Preorder flatten with miss links (same as the Python flatten).
    const int64_t mm = (int64_t)c.t.start.size();
    struct FFrame { int32_t tid; int32_t miss_link; };
    std::vector<FFrame> st;
    st.push_back({0, (int32_t)mm});
    int64_t next_node = 0;
    while (!st.empty()) {
        FFrame fr = st.back();
        st.pop_back();
        int64_t nid = next_node++;
        for (int k = 0; k < 3; k++) {
            node_bounds[nid * 6 + k] = c.t.lo[fr.tid * 3 + k];
            node_bounds[nid * 6 + 3 + k] = c.t.hi[fr.tid * 3 + k];
        }
        miss[nid] = fr.miss_link;
        axis_out[nid] = c.t.axis[fr.tid];
        if (c.t.count[fr.tid] > 0) {
            leaf_prim[nid] = (int32_t)c.t.start[fr.tid];
            leaf_count[nid] = (int32_t)c.t.count[fr.tid];
            left_out[nid] = -1;
            right_out[nid] = -1;
            continue;
        }
        leaf_prim[nid] = -1;
        leaf_count[nid] = 0;
        int64_t lsize = subtree_size(c.t, c.t.left[fr.tid]);
        left_out[nid] = (int32_t)(nid + 1);
        right_out[nid] = (int32_t)(nid + 1 + lsize);
        st.push_back({c.t.right[fr.tid], fr.miss_link});
        st.push_back({c.t.left[fr.tid], (int32_t)(nid + 1 + lsize)});
    }
    for (int64_t i = 0; i < n; i++) perm[i] = (int32_t)c.order[i];
    return mm;
}

}  // extern "C"
