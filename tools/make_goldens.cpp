// Golden-data generator: runs the C++ reference library (mounted at
// /root/reference, used strictly as an oracle) to produce binary
// fixtures under tests/golden/. The TPU framework's parity tests
// compare against these files so the C++ toolchain is not needed at
// test time.
//
// Outputs:
//   cornell_sweep.bvh   — serialized BVH (serial SweepSahBuilder, High-
//                         quality defaults) over cornell_box.obj, in the
//                         v2 byte format (bvh.h:220-242).
//   cornell_hits.bin    — closest-hit results for a WxH primary-ray grid
//                         with the CTest camera (eye 0 1 2, dir 0 0 -1,
//                         up 0 1 0): per ray u32 prim_id (0xFFFFFFFF on
//                         miss), f32 t, u, v.
//   cornell_anyhit.bin  — any-hit occlusion flags (u8) for the same rays.
//   tris.bin            — the loaded triangles (9 f32 per tri) so Python
//                         sees the exact same input.
#include <bvh/v2/bvh.h>
#include <bvh/v2/vec.h>
#include <bvh/v2/ray.h>
#include <bvh/v2/node.h>
#include <bvh/v2/sweep_sah_builder.h>
#include <bvh/v2/default_builder.h>
#include <bvh/v2/thread_pool.h>
#include <bvh/v2/stack.h>
#include <bvh/v2/tri.h>
#include <bvh/v2/stream.h>

#include "load_obj.h"

#include <cstdio>
#include <fstream>
#include <iostream>

using Scalar = float;
using Vec3 = bvh::v2::Vec<Scalar, 3>;
using BBox = bvh::v2::BBox<Scalar, 3>;
using Tri = bvh::v2::Tri<Scalar, 3>;
using Node = bvh::v2::Node<Scalar, 3>;
using Bvh = bvh::v2::Bvh<Node>;
using Ray = bvh::v2::Ray<Scalar, 3>;
using PrecomputedTri = bvh::v2::PrecomputedTri<Scalar>;

static constexpr uint32_t kInvalid = 0xFFFFFFFFu;

int main(int argc, char** argv) {
    if (argc < 3) {
        std::cerr << "usage: make_goldens <scene.obj> <out_dir> [W H]\n";
        return 1;
    }
    std::string scene = argv[1], out = argv[2];
    size_t W = argc > 3 ? std::stoul(argv[3]) : 64;
    size_t H = argc > 4 ? std::stoul(argv[4]) : 64;

    auto tris = load_obj<Scalar>(scene);
    if (tris.empty()) return 1;
    std::cout << "tris: " << tris.size() << "\n";

    {
        std::ofstream f(out + "/tris.bin", std::ios::binary);
        for (auto& t : tris)
            for (auto* p : {&t.p0, &t.p1, &t.p2})
                f.write(reinterpret_cast<const char*>(p->values), sizeof(Scalar) * 3);
    }

    std::vector<BBox> bboxes(tris.size());
    std::vector<Vec3> centers(tris.size());
    for (size_t i = 0; i < tris.size(); ++i) {
        bboxes[i] = tris[i].get_bbox();
        centers[i] = tris[i].get_center();
    }

    typename bvh::v2::SweepSahBuilder<Node>::Config config;
    auto bvh = bvh::v2::SweepSahBuilder<Node>::build(bboxes, centers, config);
    std::cout << "nodes: " << bvh.nodes.size() << "\n";

    {
        std::ofstream f(out + "/cornell_sweep.bvh", std::ios::binary);
        bvh::v2::StdOutputStream stream(f);
        bvh.serialize(stream);
    }

    std::vector<PrecomputedTri> ptris(tris.size());
    for (size_t i = 0; i < tris.size(); ++i)
        ptris[i] = tris[bvh.prim_ids[i]];  // permuted layout

    // CTest camera (test/CMakeLists.txt:16-24).
    Vec3 eye(0, 1, 2);
    auto dir = bvh::v2::normalize(Vec3(0, 0, -1));
    auto right = bvh::v2::normalize(bvh::v2::cross(dir, Vec3(0, 1, 0)));
    auto up = bvh::v2::cross(right, dir);

    std::ofstream closest(out + "/cornell_hits.bin", std::ios::binary);
    std::ofstream anyf(out + "/cornell_anyhit.bin", std::ios::binary);
    size_t hits = 0;
    for (size_t y = 0; y < H; ++y) {
        for (size_t x = 0; x < W; ++x) {
            auto u = Scalar{2} * Scalar(x) / Scalar(W) - Scalar{1};
            auto v = Scalar{2} * Scalar(y) / Scalar(H) - Scalar{1};
            Ray ray(eye, dir + u * right + v * up);

            uint32_t prim_id = kInvalid;
            Scalar tt = 0, uu = 0, vv = 0;
            bvh::v2::SmallStack<Bvh::Index, 64> stack;
            bvh.intersect<false, true>(ray, bvh.get_root().index, stack,
                [&](size_t begin, size_t end) {
                    for (size_t i = begin; i < end; ++i) {
                        if (auto hit = ptris[i].intersect(ray)) {
                            prim_id = uint32_t(i);
                            std::tie(tt, uu, vv) = *hit;
                            ray.tmax = tt;
                        }
                    }
                    return prim_id != kInvalid;
                });
            if (prim_id != kInvalid) hits++;
            closest.write(reinterpret_cast<const char*>(&prim_id), 4);
            closest.write(reinterpret_cast<const char*>(&tt), 4);
            closest.write(reinterpret_cast<const char*>(&uu), 4);
            closest.write(reinterpret_cast<const char*>(&vv), 4);

            Ray ray2(eye, dir + u * right + v * up);
            uint8_t occluded = 0;
            bvh::v2::SmallStack<Bvh::Index, 64> stack2;
            bvh.intersect<true, true>(ray2, bvh.get_root().index, stack2,
                [&](size_t begin, size_t end) {
                    for (size_t i = begin; i < end; ++i)
                        if (ptris[i].intersect(ray2)) { occluded = 1; return true; }
                    return false;
                });
            anyf.write(reinterpret_cast<const char*>(&occluded), 1);
        }
    }
    std::cout << "closest hits: " << hits << "/" << W * H << "\n";
    return 0;
}
