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

}  // extern "C"
