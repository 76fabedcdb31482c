// Additional golden fixtures: double-precision and 2D serialized BVHs
// from the C++ reference (oracle only; see make_goldens.cpp).
#include <bvh/v2/bvh.h>
#include <bvh/v2/vec.h>
#include <bvh/v2/node.h>
#include <bvh/v2/sweep_sah_builder.h>
#include <bvh/v2/stream.h>
#include "load_obj.h"
#include <fstream>
#include <iostream>

template <typename Scalar, size_t Dim>
void build_and_save(const std::vector<bvh::v2::Vec<Scalar, Dim>>& centers,
                    const std::vector<bvh::v2::BBox<Scalar, Dim>>& boxes,
                    const std::string& path) {
    using Node = bvh::v2::Node<Scalar, Dim>;
    typename bvh::v2::SweepSahBuilder<Node>::Config config;
    auto bvh = bvh::v2::SweepSahBuilder<Node>::build(boxes, centers, config);
    std::ofstream f(path, std::ios::binary);
    bvh::v2::StdOutputStream stream(f);
    bvh.serialize(stream);
    std::cout << path << ": " << bvh.nodes.size() << " nodes\n";
}

int main(int argc, char** argv) {
    auto tris = load_obj<double>(argv[1]);
    std::string out = argv[2];
    // double 3D
    {
        std::vector<bvh::v2::BBox<double, 3>> boxes(tris.size());
        std::vector<bvh::v2::Vec<double, 3>> centers(tris.size());
        for (size_t i = 0; i < tris.size(); ++i) {
            boxes[i] = tris[i].get_bbox();
            centers[i] = tris[i].get_center();
        }
        build_and_save<double, 3>(centers, boxes, out + "/cornell_sweep_d.bvh");
    }
    // float 2D: project to xy
    {
        std::vector<bvh::v2::BBox<float, 2>> boxes(tris.size());
        std::vector<bvh::v2::Vec<float, 2>> centers(tris.size());
        for (size_t i = 0; i < tris.size(); ++i) {
            auto b3 = tris[i].get_bbox();
            boxes[i] = bvh::v2::BBox<float, 2>(
                bvh::v2::Vec<float, 2>(float(b3.min[0]), float(b3.min[1])),
                bvh::v2::Vec<float, 2>(float(b3.max[0]), float(b3.max[1])));
            auto c3 = tris[i].get_center();
            centers[i] = bvh::v2::Vec<float, 2>(float(c3[0]), float(c3[1]));
        }
        build_and_save<float, 2>(centers, boxes, out + "/cornell_sweep_2d.bvh");
    }
    return 0;
}
