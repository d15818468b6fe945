// evomotion_host: native host-side tier of evomotion_tpu.
//
// The reference implements its entire runtime in C++ (Bullet world assembly,
// JSON robot serialization, OBJ loading, RNG). In the TPU rebuild the compute
// path is XLA; the host-side model-compilation machinery that remains off
// device is provided natively here and bound via ctypes
// (evomotion_tpu/native/__init__.py), with pure-Python fallbacks:
//
//  - IEEE-754 float <-> bit codec (reference: converter.cpp:128-147)
//  - std::mt19937 + libstdc++ uniform float stream (reference env RNG,
//    e.g. robot_walk.cpp:21)
//  - Wavefront OBJ vertex parsing (reference: shapes.cpp:23-62)
//  - 3D convex hull (quickhull) + farthest-point decimation for collision
//    hull compilation (role of btConvexHullShape + btShapeHull)
//  - greedy graph coloring for the solver phase schedule (model.py
//    _color_blocks) — O(V+E), matters for large builder robots
//
// Build: cd native && make   (produces libevomotion_host.so)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- codec ----

uint32_t em_float_to_bits(float f) {
    uint32_t b;
    std::memcpy(&b, &f, 4);
    return b;
}

float em_bits_to_float(uint32_t b) {
    float f;
    std::memcpy(&f, &b, 4);
    return f;
}

// ------------------------------------------------------------- mt19937 ----

void* em_mt19937_create(uint32_t seed) { return new std::mt19937(seed); }

void em_mt19937_destroy(void* gen) { delete static_cast<std::mt19937*>(gen); }

uint32_t em_mt19937_next(void* gen) { return (*static_cast<std::mt19937*>(gen))(); }

// libstdc++ generate_canonical<float, 24> with a 32-bit engine: one draw
// scaled by 2^-32, retried while it rounds to 1.0f
float em_mt19937_uniform(void* gen) {
    auto& g = *static_cast<std::mt19937*>(gen);
    while (true) {
        float r = static_cast<float>(g()) * (1.0f / 4294967296.0f);
        if (r < 1.0f) return r;
    }
}

void em_mt19937_uniform_fill(void* gen, float* out, int n) {
    for (int i = 0; i < n; i++) out[i] = em_mt19937_uniform(gen);
}

// ------------------------------------------------------------ OBJ parse ----

// Parse "v x y z" lines from a Wavefront OBJ. Returns number of vertices
// written (up to cap); total count even if > cap.
int em_parse_obj_vertices(const char* path, float* out_xyz, int cap) {
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    char line[512];
    int n = 0;
    while (std::fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            float x, y, z;
            if (std::sscanf(line + 1, "%f %f %f", &x, &y, &z) == 3) {
                if (n < cap) {
                    out_xyz[3 * n] = x;
                    out_xyz[3 * n + 1] = y;
                    out_xyz[3 * n + 2] = z;
                }
                n++;
            }
        }
    }
    std::fclose(f);
    return n;
}

// ---------------------------------------------------------- convex hull ----

namespace {

struct V3 {
    double x, y, z;
    V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
    V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
    V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
inline V3 cross(const V3& a, const V3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

struct Face {
    int a, b, c;
    V3 n;
    double d;  // plane: dot(n, x) - d = 0, n outward
    bool alive = true;
};

// Incremental quickhull-style 3D convex hull over the point set; returns the
// indices of hull vertices.
std::vector<int> convex_hull_indices(const std::vector<V3>& pts) {
    const int n = static_cast<int>(pts.size());
    std::vector<int> result;
    if (n < 4) {
        for (int i = 0; i < n; i++) result.push_back(i);
        return result;
    }

    // initial tetrahedron from extreme points
    int i0 = 0, i1 = 0;
    for (int i = 0; i < n; i++) {
        if (pts[i].x < pts[i0].x) i0 = i;
        if (pts[i].x > pts[i1].x) i1 = i;
    }
    if (i0 == i1) i1 = (i0 + 1) % n;
    int i2 = -1;
    double best = -1;
    for (int i = 0; i < n; i++) {
        double a = norm(cross(pts[i1] - pts[i0], pts[i] - pts[i0]));
        if (a > best) {
            best = a;
            i2 = i;
        }
    }
    int i3 = -1;
    best = -1;
    V3 nrm = cross(pts[i1] - pts[i0], pts[i2] - pts[i0]);
    for (int i = 0; i < n; i++) {
        double v = std::fabs(dot(nrm, pts[i] - pts[i0]));
        if (v > best) {
            best = v;
            i3 = i;
        }
    }
    if (best < 1e-12) {  // degenerate (planar) — return extremes of bbox
        std::set<int> keep = {i0, i1, i2};
        return std::vector<int>(keep.begin(), keep.end());
    }

    std::vector<Face> faces;
    auto add_face = [&](int a, int b, int c, const V3& interior) {
        Face f{a, b, c, {}, 0.0, true};
        f.n = cross(pts[b] - pts[a], pts[c] - pts[a]);
        double ln = norm(f.n);
        if (ln > 1e-18) f.n = f.n * (1.0 / ln);
        f.d = dot(f.n, pts[a]);
        if (dot(f.n, interior) - f.d > 0) {  // flip outward
            std::swap(f.b, f.c);
            f.n = f.n * -1.0;
            f.d = -f.d;
        }
        faces.push_back(f);
    };
    V3 interior = (pts[i0] + pts[i1] + pts[i2] + pts[i3]) * 0.25;
    add_face(i0, i1, i2, interior);
    add_face(i0, i1, i3, interior);
    add_face(i0, i2, i3, interior);
    add_face(i1, i2, i3, interior);

    const double eps = 1e-9;
    for (int p = 0; p < n; p++) {
        // find faces visible from p
        std::vector<int> visible;
        for (int fi = 0; fi < static_cast<int>(faces.size()); fi++) {
            if (!faces[fi].alive) continue;
            if (dot(faces[fi].n, pts[p]) - faces[fi].d > eps) visible.push_back(fi);
        }
        if (visible.empty()) continue;
        // horizon = edges shared by exactly one visible face
        std::vector<std::array<int, 2>> horizon;
        auto edge_count = [&](int a, int b) {
            int cnt = 0;
            for (int fi : visible) {
                const Face& f = faces[fi];
                std::array<std::array<int, 2>, 3> es = {{{f.a, f.b}, {f.b, f.c}, {f.c, f.a}}};
                for (auto& e : es)
                    if ((e[0] == a && e[1] == b) || (e[0] == b && e[1] == a)) cnt++;
            }
            return cnt;
        };
        for (int fi : visible) {
            const Face& f = faces[fi];
            std::array<std::array<int, 2>, 3> es = {{{f.a, f.b}, {f.b, f.c}, {f.c, f.a}}};
            for (auto& e : es)
                if (edge_count(e[0], e[1]) == 1) horizon.push_back(e);
        }
        for (int fi : visible) faces[fi].alive = false;
        for (auto& e : horizon) add_face(e[0], e[1], p, interior);
    }

    std::set<int> verts;
    for (const Face& f : faces)
        if (f.alive) {
            verts.insert(f.a);
            verts.insert(f.b);
            verts.insert(f.c);
        }
    return std::vector<int>(verts.begin(), verts.end());
}

}  // namespace

// Reduce points to convex-hull extreme vertices, then (if needed) decimate to
// max_verts by farthest-point sampling (mirrors shapes.reduce_to_hull).
// Returns number of output vertices written to out_xyz.
int em_reduce_hull(const float* xyz, int n, int max_verts, float* out_xyz) {
    std::vector<V3> pts(n);
    for (int i = 0; i < n; i++) pts[i] = {xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]};
    std::vector<int> hull = convex_hull_indices(pts);

    std::vector<V3> verts;
    for (int i : hull) verts.push_back(pts[i]);

    if (static_cast<int>(verts.size()) > max_verts) {
        std::set<int> chosen_set;
        for (int k = 0; k < 3; k++) {
            int lo = 0, hi = 0;
            for (int i = 1; i < static_cast<int>(verts.size()); i++) {
                double* vi = &verts[i].x;
                double* vlo = &verts[lo].x;
                double* vhi = &verts[hi].x;
                if (vi[k] < vlo[k]) lo = i;
                if (vi[k] > vhi[k]) hi = i;
            }
            chosen_set.insert(lo);
            chosen_set.insert(hi);
        }
        std::vector<int> chosen(chosen_set.begin(), chosen_set.end());
        std::vector<double> d(verts.size(), 1e300);
        for (size_t i = 0; i < verts.size(); i++)
            for (int c : chosen) d[i] = std::min(d[i], norm(verts[i] - verts[c]));
        while (static_cast<int>(chosen.size()) < max_verts) {
            int nxt = static_cast<int>(
                std::max_element(d.begin(), d.end()) - d.begin());
            chosen.push_back(nxt);
            for (size_t i = 0; i < verts.size(); i++)
                d[i] = std::min(d[i], norm(verts[i] - verts[nxt]));
        }
        std::sort(chosen.begin(), chosen.end());
        std::vector<V3> dec;
        for (int c : chosen) dec.push_back(verts[c]);
        // re-hull the decimated set
        std::vector<int> hull2 = convex_hull_indices(dec);
        std::vector<V3> out;
        for (int i : hull2) out.push_back(dec[i]);
        verts = out;
    }

    for (size_t i = 0; i < verts.size(); i++) {
        out_xyz[3 * i] = static_cast<float>(verts[i].x);
        out_xyz[3 * i + 1] = static_cast<float>(verts[i].y);
        out_xyz[3 * i + 2] = static_cast<float>(verts[i].z);
    }
    return static_cast<int>(verts.size());
}

// ------------------------------------------------------- graph coloring ----

// Greedy first-fit coloring over blocks with conflict edges; mirrors
// ModelBuilder._color_blocks ordering semantics (blocks in index order, first
// color whose members don't conflict). edges: pairs of block ids.
// out_colors[n_blocks]; returns number of colors.
int em_greedy_color(int n_blocks, const int32_t* edges, int n_edges, int32_t* out_colors) {
    std::vector<std::vector<int>> adj(n_blocks);
    for (int e = 0; e < n_edges; e++) {
        int a = edges[2 * e], b = edges[2 * e + 1];
        adj[a].push_back(b);
        adj[b].push_back(a);
    }
    int n_colors = 0;
    for (int b = 0; b < n_blocks; b++) {
        std::vector<bool> used(n_colors, false);
        for (int nb : adj[b])
            if (nb < b && out_colors[nb] >= 0 && out_colors[nb] < n_colors)
                used[out_colors[nb]] = true;
        int c = 0;
        while (c < n_colors && used[c]) c++;
        if (c == n_colors) n_colors++;
        out_colors[b] = c;
    }
    return n_colors;
}

}  // extern "C"
