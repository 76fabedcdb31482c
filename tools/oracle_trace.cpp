// Scale oracle: trace an arbitrary ray set through a serialized BVH
// with the C++ reference library (mounted read-only at /root/reference,
// used strictly as a test oracle, like make_goldens.cpp). Inputs are
// raw binary files produced by tools/check_oracle.py so no geometry or
// camera math is duplicated here.
//
// usage: oracle_trace <bvh.bin> <tris.bin> <rays.bin> <out.bin>
//                     [--robust] [--any-hit] [--permuted]
//
//   tris.bin: n * 9 f32 (p0 p1 p2), in ORIGINAL primitive order.
//   rays.bin: R * 8 f32 (org dir tmin tmax).
//   out.bin:  per ray u32 prim_pos (position in bvh.prim_ids,
//             0xFFFFFFFF on miss), f32 t, u, v.
#include <bvh/v2/bvh.h>
#include <bvh/v2/node.h>
#include <bvh/v2/ray.h>
#include <bvh/v2/stack.h>
#include <bvh/v2/stream.h>
#include <bvh/v2/tri.h>
#include <bvh/v2/vec.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <vector>

using Scalar = float;
using Vec3 = bvh::v2::Vec<Scalar, 3>;
using Node = bvh::v2::Node<Scalar, 3>;
using Bvh = bvh::v2::Bvh<Node>;
using Ray = bvh::v2::Ray<Scalar, 3>;
using PrecomputedTri = bvh::v2::PrecomputedTri<Scalar>;

static constexpr uint32_t kInvalid = 0xFFFFFFFFu;

static std::vector<char> read_all(const char* path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { std::cerr << "cannot open " << path << "\n"; exit(1); }
    in.seekg(0, std::ios::end);
    std::vector<char> buf(in.tellg());
    in.seekg(0);
    in.read(buf.data(), buf.size());
    return buf;
}

template <bool IsAnyHit, bool IsRobust>
static void trace(const Bvh& bvh, const std::vector<PrecomputedTri>& tris,
                  const float* rays, size_t R, uint32_t* out_prim,
                  float* out_tuv) {
    for (size_t r = 0; r < R; ++r) {
        const float* rp = rays + r * 8;
        Ray ray{Vec3(rp[0], rp[1], rp[2]), Vec3(rp[3], rp[4], rp[5]),
                rp[6], rp[7]};
        uint32_t prim = kInvalid;
        float u = 0, v = 0;
        bvh::v2::SmallStack<Bvh::Index, 64> stack;
        bvh.intersect<IsAnyHit, IsRobust>(
            ray, bvh.get_root().index, stack,
            [&](size_t begin, size_t end) {
                for (size_t i = begin; i < end; ++i) {
                    if (auto hit = tris[i].intersect(ray)) {
                        prim = (uint32_t)i;
                        std::tie(ray.tmax, u, v) = *hit;
                        if (IsAnyHit) return true;
                    }
                }
                return prim != kInvalid && IsAnyHit;
            });
        out_prim[r] = prim;
        out_tuv[r * 3 + 0] = ray.tmax;
        out_tuv[r * 3 + 1] = u;
        out_tuv[r * 3 + 2] = v;
    }
}

int main(int argc, char** argv) {
    if (argc < 5) {
        std::cerr << "usage: oracle_trace <bvh.bin> <tris.bin> <rays.bin>"
                     " <out.bin> [--robust] [--any-hit] [--permuted]\n";
        return 1;
    }
    bool robust = false, any_hit = false, permuted = false;
    for (int i = 5; i < argc; ++i) {
        if (!strcmp(argv[i], "--robust")) robust = true;
        if (!strcmp(argv[i], "--any-hit")) any_hit = true;
        if (!strcmp(argv[i], "--permuted")) permuted = true;
    }

    std::ifstream bvh_in(argv[1], std::ios::binary);
    if (!bvh_in) { std::cerr << "cannot open " << argv[1] << "\n"; return 1; }
    bvh::v2::StdInputStream stream(bvh_in);
    auto bvh = Bvh::deserialize(stream);

    auto tri_buf = read_all(argv[2]);
    size_t n = tri_buf.size() / (9 * sizeof(float));
    const float* tp = reinterpret_cast<const float*>(tri_buf.data());
    // Precompute in traversal order: position i in prim_ids.
    std::vector<PrecomputedTri> tris(n);
    for (size_t i = 0; i < n; ++i) {
        size_t src = permuted ? i : bvh.prim_ids[i];
        const float* t = tp + src * 9;
        tris[i] = PrecomputedTri(bvh::v2::Tri<Scalar, 3>(
            Vec3(t[0], t[1], t[2]), Vec3(t[3], t[4], t[5]),
            Vec3(t[6], t[7], t[8])));
    }

    auto ray_buf = read_all(argv[3]);
    size_t R = ray_buf.size() / (8 * sizeof(float));
    const float* rays = reinterpret_cast<const float*>(ray_buf.data());

    std::vector<uint32_t> out_prim(R);
    std::vector<float> out_tuv(R * 3);
    auto t0 = std::chrono::steady_clock::now();
    if (any_hit && robust)
        trace<true, true>(bvh, tris, rays, R, out_prim.data(), out_tuv.data());
    else if (any_hit)
        trace<true, false>(bvh, tris, rays, R, out_prim.data(), out_tuv.data());
    else if (robust)
        trace<false, true>(bvh, tris, rays, R, out_prim.data(), out_tuv.data());
    else
        trace<false, false>(bvh, tris, rays, R, out_prim.data(), out_tuv.data());
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();

    size_t hits = 0;
    for (size_t r = 0; r < R; ++r) hits += out_prim[r] != kInvalid;
    std::fprintf(stderr, "oracle: %zu rays, %zu hits, %.3f s (%.2f Mrays/s)\n",
                 R, hits, dt, R / dt / 1e6);

    std::ofstream out(argv[4], std::ios::binary);
    for (size_t r = 0; r < R; ++r) {
        out.write(reinterpret_cast<const char*>(&out_prim[r]), 4);
        out.write(reinterpret_cast<const char*>(&out_tuv[r * 3]), 12);
    }
    return 0;
}
