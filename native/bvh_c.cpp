// bvh_tpu native runtime: original C++ implementation of the C API in
// bvh_c.h. Layout and serialization bytes match the v2 contract
// (reference: node.h:31-37, index.h:74-78, bvh.h:220-242) so handles
// interoperate with the JAX framework and with the C++ reference; the
// implementation below is written from scratch around a flat
// struct-of-vectors BVH.
//
// Algorithms provided:
//  - binned SAH top-down build (Wald-style, 8 bins)   [quality LOW]
//  - exact sweep SAH build                             [MEDIUM/HIGH]
//  - reinsertion optimization (Meister & Bittner)      [HIGH]
//  - stack traversal, closest/any x fast/robust
//  - refit, v2-format save/load, node surgery
//  - std::thread pool (used for the reinsertion search batch)

#include "bvh_c.h"

#include <algorithm>
#include <atomic>
#include <cassert>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <limits>
#include <mutex>
#include <numeric>
#include <optional>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------- pool
class Pool {
public:
    explicit Pool(size_t count) {
        if (count == 0) count = std::max(1u, std::thread::hardware_concurrency());
        for (size_t i = 0; i < count; ++i)
            workers_.emplace_back([this] { run(); });
    }
    ~Pool() {
        {
            std::unique_lock<std::mutex> lock(mutex_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& w : workers_) w.join();
    }
    void push(std::function<void()> task) {
        {
            std::unique_lock<std::mutex> lock(mutex_);
            tasks_.push(std::move(task));
            ++pending_;
        }
        cv_.notify_one();
    }
    void wait() {
        std::unique_lock<std::mutex> lock(mutex_);
        done_cv_.wait(lock, [this] { return pending_ == 0; });
    }
    size_t size() const { return workers_.size(); }

private:
    void run() {
        for (;;) {
            std::function<void()> task;
            {
                std::unique_lock<std::mutex> lock(mutex_);
                cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
                if (stop_ && tasks_.empty()) return;
                task = std::move(tasks_.front());
                tasks_.pop();
            }
            task();
            {
                std::unique_lock<std::mutex> lock(mutex_);
                if (--pending_ == 0) done_cv_.notify_all();
            }
        }
    }
    std::vector<std::thread> workers_;
    std::queue<std::function<void()>> tasks_;
    std::mutex mutex_;
    std::condition_variable cv_, done_cv_;
    size_t pending_ = 0;
    bool stop_ = false;
};

// ------------------------------------------------------------- geometry
template <typename T, int Dim> struct VecN {
    T v[Dim];
    T& operator[](int i) { return v[i]; }
    T operator[](int i) const { return v[i]; }
};

template <typename T> T rmin(T a, T b) { return a < b ? a : b; }  // NaN -> b
template <typename T> T rmax(T a, T b) { return a > b ? a : b; }

template <typename T, int Dim> struct Box {
    VecN<T, Dim> mn, mx;
    static Box empty() {
        Box b;
        for (int i = 0; i < Dim; ++i) {
            b.mn[i] = std::numeric_limits<T>::max();
            b.mx[i] = -std::numeric_limits<T>::max();
        }
        return b;
    }
    void grow(const Box& o) {
        for (int i = 0; i < Dim; ++i) {
            mn[i] = rmin(o.mn[i], mn[i]);
            mx[i] = rmax(o.mx[i], mx[i]);
        }
    }
    T half_area() const {
        T d[Dim];
        for (int i = 0; i < Dim; ++i) d[i] = mx[i] - mn[i];
        if constexpr (Dim == 3) return (d[0] + d[1]) * d[2] + d[0] * d[1];
        if constexpr (Dim == 2) return d[0] + d[1];
        T s = 0;
        for (int i = 0; i < Dim; ++i)
            for (int j = i + 1; j < Dim; ++j) s += d[i] * d[j];
        return s;
    }
};

// ------------------------------------------------------------- flat bvh
template <typename T> struct IndexWord;
template <> struct IndexWord<float>  { using type = uint32_t; };
template <> struct IndexWord<double> { using type = uint64_t; };

constexpr int kPrimCountBits = 4;     // reference: node.h:22
constexpr uint64_t kMaxPrimCount = 15;

template <typename T, int Dim> struct FlatBvh {
    using Word = typename IndexWord<T>::type;
    struct Node {
        T bounds[2 * Dim];  // interleaved min/max (reference: node.h:31-34)
        Word index;
        bool is_leaf() const { return (index & kMaxPrimCount) != 0; }
        size_t first_id() const { return size_t(index >> kPrimCountBits); }
        size_t count() const { return size_t(index & kMaxPrimCount); }
        Box<T, Dim> box() const {
            Box<T, Dim> b;
            for (int i = 0; i < Dim; ++i) {
                b.mn[i] = bounds[2 * i];
                b.mx[i] = bounds[2 * i + 1];
            }
            return b;
        }
        void set_box(const Box<T, Dim>& b) {
            for (int i = 0; i < Dim; ++i) {
                bounds[2 * i] = b.mn[i];
                bounds[2 * i + 1] = b.mx[i];
            }
        }
        static Word leaf(size_t first, size_t count) {
            return (Word(first) << kPrimCountBits) | Word(count);
        }
        static Word inner(size_t first_child) {
            return Word(first_child) << kPrimCountBits;
        }
    };
    std::vector<Node> nodes;
    std::vector<Word> prim_ids;
};

// ------------------------------------------------- top-down SAH builders
template <typename T, int Dim> struct BuildInput {
    const Box<T, Dim>* boxes;
    const VecN<T, Dim>* centers;
    size_t n;
    size_t min_leaf, max_leaf;
};

// Work-stack binned SAH build; own structure, same cost model as the
// reference family (split_heuristic.h): leaf cost = half_area * count,
// non-split cost subtracts a unit cost ratio.
template <typename T, int Dim>
FlatBvh<T, Dim> build_binned(const BuildInput<T, Dim>& in) {
    constexpr int kBins = 8;
    using Bvh = FlatBvh<T, Dim>;
    using Node = typename Bvh::Node;
    Bvh bvh;
    bvh.prim_ids.resize(in.n);
    std::iota(bvh.prim_ids.begin(), bvh.prim_ids.end(), 0);

    auto range_box = [&](size_t b, size_t e) {
        auto box = Box<T, Dim>::empty();
        for (size_t i = b; i < e; ++i) box.grow(in.boxes[bvh.prim_ids[i]]);
        return box;
    };

    bvh.nodes.reserve(2 * in.n);
    bvh.nodes.emplace_back();
    bvh.nodes[0].set_box(range_box(0, in.n));

    struct Item { size_t node, begin, end; };
    std::vector<Item> stack{{0, 0, in.n}};
    while (!stack.empty()) {
        auto [node_id, begin, end] = stack.back();
        stack.pop_back();
        size_t size = end - begin;
        auto node_box = bvh.nodes[node_id].box();

        size_t split = size_t(-1);
        if (size > in.min_leaf) {
            // Bin primitive centers on each axis.
            struct Bin { Box<T, Dim> box = Box<T, Dim>::empty(); size_t cnt = 0; };
            Bin bins[Dim][kBins];
            T scale[Dim], offset[Dim];
            for (int a = 0; a < Dim; ++a) {
                T d = node_box.mx[a] - node_box.mn[a];
                scale[a] = T(kBins) / d;
                offset[a] = -node_box.mn[a] * scale[a];
            }
            for (size_t i = begin; i < end; ++i) {
                auto id = bvh.prim_ids[i];
                for (int a = 0; a < Dim; ++a) {
                    T p = in.centers[id][a] * scale[a] + offset[a];
                    p = rmax(p, T(0));
                    int bi = int(rmin(p, T(kBins - 1)));
                    bins[a][bi].box.grow(in.boxes[id]);
                    bins[a][bi].cnt++;
                }
            }
            // Sweep bins for the best split.
            T best_cost = std::numeric_limits<T>::max();
            int best_axis = -1, best_bin = 0;
            for (int a = 0; a < Dim; ++a) {
                T right_cost[kBins];
                Bin acc;
                for (int i = kBins - 1; i > 0; --i) {
                    acc.box.grow(bins[a][i].box);
                    acc.cnt += bins[a][i].cnt;
                    right_cost[i] = acc.cnt ? acc.box.half_area() * T(acc.cnt)
                                            : std::numeric_limits<T>::max();
                }
                Bin lacc;
                for (int i = 0; i < kBins - 1; ++i) {
                    lacc.box.grow(bins[a][i].box);
                    lacc.cnt += bins[a][i].cnt;
                    if (!lacc.cnt || right_cost[i + 1] == std::numeric_limits<T>::max())
                        continue;
                    T c = lacc.box.half_area() * T(lacc.cnt) + right_cost[i + 1];
                    if (c < best_cost) { best_cost = c; best_axis = a; best_bin = i + 1; }
                }
            }
            int largest = 0;
            for (int a = 1; a < Dim; ++a)
                if (node_box.mx[a] - node_box.mn[a] >
                    node_box.mx[largest] - node_box.mn[largest])
                    largest = a;
            T non_split = node_box.half_area() * (T(size) - T(1));
            bool take_sah = best_axis >= 0 && best_cost < non_split;
            if (take_sah) {
                T pos = (node_box.mx[best_axis] - node_box.mn[best_axis]) /
                            T(kBins) * T(best_bin) + node_box.mn[best_axis];
                auto* ids = bvh.prim_ids.data();
                auto* mid = std::partition(ids + begin, ids + end, [&](auto id) {
                    return in.centers[id][best_axis] < pos;
                });
                split = size_t(mid - ids);
                if (split == begin || split == end) take_sah = false;
            }
            if (!take_sah) {
                if (size > in.max_leaf) {  // forced median split
                    split = (begin + end + 1) / 2;
                    auto* ids = bvh.prim_ids.data();
                    std::nth_element(ids + begin, ids + split, ids + end,
                                     [&](auto i, auto j) {
                                         return in.centers[i][largest] <
                                                in.centers[j][largest];
                                     });
                } else {
                    split = size_t(-1);
                }
            }
        }

        if (split == size_t(-1)) {
            bvh.nodes[node_id].index = Node::leaf(begin, size);
            continue;
        }
        size_t child = bvh.nodes.size();
        bvh.nodes.emplace_back();
        bvh.nodes.emplace_back();
        bvh.nodes[node_id].index = Node::inner(child);
        auto lbox = range_box(begin, split);
        auto rbox = range_box(split, end);
        // SATO: larger-area child goes left (top_down_sah_builder.h:100-108).
        bool swap = lbox.half_area() < rbox.half_area();
        bvh.nodes[child + 0].set_box(swap ? rbox : lbox);
        bvh.nodes[child + 1].set_box(swap ? lbox : rbox);
        Item a{child + 0, begin, split}, b{child + 1, split, end};
        if (swap) { a.begin = split; a.end = end; b.begin = begin; b.end = split; }
        stack.push_back(a);
        stack.push_back(b);
    }
    return bvh;
}

// Exact sweep SAH: presort per axis once, evaluate every split.
template <typename T, int Dim>
FlatBvh<T, Dim> build_sweep(const BuildInput<T, Dim>& in) {
    using Bvh = FlatBvh<T, Dim>;
    using Node = typename Bvh::Node;
    Bvh bvh;

    std::vector<uint32_t> order[Dim];
    for (int a = 0; a < Dim; ++a) {
        order[a].resize(in.n);
        std::iota(order[a].begin(), order[a].end(), 0);
        std::stable_sort(order[a].begin(), order[a].end(), [&](auto i, auto j) {
            return in.centers[i][a] < in.centers[j][a];
        });
    }
    std::vector<uint8_t> marks(in.n);
    std::vector<T> accum(in.n);

    auto range_box = [&](size_t b, size_t e) {
        auto box = Box<T, Dim>::empty();
        for (size_t i = b; i < e; ++i) box.grow(in.boxes[order[0][i]]);
        return box;
    };

    bvh.nodes.reserve(2 * in.n);
    bvh.nodes.emplace_back();
    bvh.nodes[0].set_box(range_box(0, in.n));

    struct Item { size_t node, begin, end; };
    std::vector<Item> stack{{0, 0, in.n}};
    while (!stack.empty()) {
        auto [node_id, begin, end] = stack.back();
        stack.pop_back();
        size_t size = end - begin;
        auto node_box = bvh.nodes[node_id].box();

        size_t split = size_t(-1);
        int split_axis = 0;
        if (size > in.min_leaf) {
            T leaf_cost = node_box.half_area() * (T(size) - T(1));
            T best = leaf_cost;
            for (int a = 0; a < Dim; ++a) {
                auto rbox = Box<T, Dim>::empty();
                for (size_t i = end; i-- > begin + 1;) {
                    rbox.grow(in.boxes[order[a][i]]);
                    accum[i] = rbox.half_area() * T(end - i);
                }
                auto lbox = Box<T, Dim>::empty();
                for (size_t i = begin; i < end - 1; ++i) {
                    lbox.grow(in.boxes[order[a][i]]);
                    T c = lbox.half_area() * T(i + 1 - begin) + accum[i + 1];
                    if (c < best) { best = c; split = i + 1; split_axis = a; }
                }
            }
            if (split == size_t(-1) && size > in.max_leaf) {  // forced median
                split = (begin + end + 1) / 2;
                split_axis = 0;
                for (int a = 1; a < Dim; ++a)
                    if (node_box.mx[a] - node_box.mn[a] >
                        node_box.mx[split_axis] - node_box.mn[split_axis])
                        split_axis = a;
            }
        }
        if (split == size_t(-1)) {
            bvh.nodes[node_id].index = Node::leaf(begin, size);
            continue;
        }
        // Mark + stable partition of the other axis orders
        // (sweep_sah_builder.h:103-136 semantics).
        for (size_t i = begin; i < split; ++i) marks[order[split_axis][i]] = 1;
        for (size_t i = split; i < end; ++i) marks[order[split_axis][i]] = 0;
        for (int a = 0; a < Dim; ++a) {
            if (a == split_axis) continue;
            std::stable_partition(order[a].begin() + begin, order[a].begin() + end,
                                  [&](auto id) { return marks[id] != 0; });
        }
        size_t child = bvh.nodes.size();
        bvh.nodes.emplace_back();
        bvh.nodes.emplace_back();
        bvh.nodes[node_id].index = Node::inner(child);
        auto lbox = Box<T, Dim>::empty(), rbox = Box<T, Dim>::empty();
        for (size_t i = begin; i < split; ++i) lbox.grow(in.boxes[order[0][i]]);
        for (size_t i = split; i < end; ++i) rbox.grow(in.boxes[order[0][i]]);
        bool swap = lbox.half_area() < rbox.half_area();
        bvh.nodes[child + 0].set_box(swap ? rbox : lbox);
        bvh.nodes[child + 1].set_box(swap ? lbox : rbox);
        Item a{child + 0, begin, split}, b{child + 1, split, end};
        if (swap) { a.begin = split; a.end = end; b.begin = begin; b.end = split; }
        stack.push_back(a);
        stack.push_back(b);
    }
    bvh.prim_ids.assign(order[0].begin(), order[0].end());
    return bvh;
}

// ---------------------------------------------------- mini-tree builder
// Parallel build pipeline (reference: mini_tree_builder.h:47-310):
// morton-grid binning of primitive centers, greedy merge of adjacent
// bins up to the parallel threshold, one sweep-SAH mini tree per group
// (pool tasks), area pruning of oversized mini-tree tops, a sweep top
// tree over the pruned roots, and an index-offset splice. Primitives
// are sorted by (group, id) first so parallel rebuilds are
// deterministic (reference: 122-124).
inline uint32_t interleave3(uint32_t x) {
    x &= 0x3ffu;
    x = (x | (x << 16)) & 0x30000ffu;
    x = (x | (x << 8)) & 0x300f00fu;
    x = (x | (x << 4)) & 0x30c30c3u;
    x = (x | (x << 2)) & 0x9249249u;
    return x;
}
inline uint32_t interleave2(uint32_t x) {
    x &= 0xffffu;
    x = (x | (x << 8)) & 0x00ff00ffu;
    x = (x | (x << 4)) & 0x0f0f0f0fu;
    x = (x | (x << 2)) & 0x33333333u;
    x = (x | (x << 1)) & 0x55555555u;
    return x;
}

template <int Dim> uint32_t morton_cell(const uint32_t* c) {
    if constexpr (Dim == 2)
        return interleave2(c[0]) | (interleave2(c[1]) << 1);
    else if constexpr (Dim == 3)
        return interleave3(c[0]) | (interleave3(c[1]) << 1) |
               (interleave3(c[2]) << 2);
    else {
        uint32_t m = 0;
        for (int b = 0; b < 8; ++b)
            for (int a = 0; a < Dim; ++a)
                m |= ((c[a] >> b) & 1u) << uint32_t(b * Dim + a);
        return m;
    }
}

template <typename T, int Dim>
FlatBvh<T, Dim> build_minitree(const BuildInput<T, Dim>& in, Pool* pool,
                               size_t parallel_threshold) {
    using Bvh = FlatBvh<T, Dim>;
    using Node = typename Bvh::Node;
    using Word = typename Bvh::Word;
    constexpr int kLog2Grid = 4;        // reference: mini_tree_builder.h:40
    const T kPruneRatio = T(0.01);      // reference: mini_tree_builder.h:38
    const int grid_dim = 1 << kLog2Grid;
    const size_t bin_count = size_t(1) << (kLog2Grid * Dim);
    if (parallel_threshold == 0) parallel_threshold = 1024;

    // -- steps 1-2: center bbox, morton bin per prim (ref: 160-187) ----
    VecN<T, Dim> cmin, cmax;
    for (int a = 0; a < Dim; ++a) {
        cmin[a] = std::numeric_limits<T>::max();
        cmax[a] = -std::numeric_limits<T>::max();
    }
    for (size_t i = 0; i < in.n; ++i)
        for (int a = 0; a < Dim; ++a) {
            cmin[a] = rmin(in.centers[i][a], cmin[a]);
            cmax[a] = rmax(in.centers[i][a], cmax[a]);
        }
    T scale[Dim], offset[Dim];
    for (int a = 0; a < Dim; ++a) {
        T d = cmax[a] - cmin[a];
        scale[a] = d > T(0) ? T(grid_dim) / d : T(0);
        offset[a] = -cmin[a] * scale[a];
    }
    std::vector<uint32_t> bin_of(in.n);
    std::vector<size_t> bin_sizes(bin_count, 0);
    for (size_t i = 0; i < in.n; ++i) {
        uint32_t c[Dim];
        for (int a = 0; a < Dim; ++a) {
            T p = in.centers[i][a] * scale[a] + offset[a];
            p = rmax(p, T(0));
            c[a] = uint32_t(rmin(p, T(grid_dim - 1)));
        }
        uint32_t m = morton_cell<Dim>(c) & uint32_t(bin_count - 1);
        bin_of[i] = m;
        bin_sizes[m]++;
    }

    // -- step 3: greedy merge of adjacent bins (ref: 84-91) ------------
    std::vector<uint32_t> group_of_bin(bin_count);
    uint32_t ng = 0;
    size_t acc = 0;
    for (size_t b = 0; b < bin_count; ++b) {
        if (acc > 0 && acc + bin_sizes[b] > parallel_threshold) {
            ++ng;
            acc = 0;
        }
        group_of_bin[b] = ng;
        acc += bin_sizes[b];
    }
    const size_t group_cap = size_t(ng) + 1;

    // counting sort by group; iterating ids ascending keeps the sort
    // stable, i.e. (group, id) order (ref: 122-124)
    std::vector<size_t> gcount(group_cap, 0);
    for (size_t i = 0; i < in.n; ++i) gcount[group_of_bin[bin_of[i]]]++;
    std::vector<size_t> gbase(group_cap + 1, 0);
    for (size_t j = 0; j < group_cap; ++j) gbase[j + 1] = gbase[j] + gcount[j];
    std::vector<Word> sorted_ids(in.n);
    {
        std::vector<size_t> cur(gbase.begin(), gbase.end() - 1);
        for (size_t i = 0; i < in.n; ++i)
            sorted_ids[cur[group_of_bin[bin_of[i]]]++] = Word(i);
    }

    // -- step 4: one sweep mini tree per non-empty group (ref: 196-202)
    struct Task { size_t begin, end; Bvh tree; };
    std::vector<Task> tasks;
    tasks.reserve(group_cap);
    for (size_t j = 0; j < group_cap; ++j)
        if (gcount[j]) tasks.push_back({gbase[j], gbase[j] + gcount[j], {}});
    auto run_task = [&](Task& t) {
        size_t m = t.end - t.begin;
        std::vector<Box<T, Dim>> boxes(m);
        std::vector<VecN<T, Dim>> centers(m);
        for (size_t i = 0; i < m; ++i) {
            auto id = sorted_ids[t.begin + i];
            boxes[i] = in.boxes[id];
            centers[i] = in.centers[id];
        }
        BuildInput<T, Dim> gin{boxes.data(), centers.data(), m,
                               in.min_leaf, in.max_leaf};
        t.tree = build_sweep(gin);
    };
    if (pool && tasks.size() > 1) {
        for (auto& t : tasks) {
            Task* tp = &t;
            pool->push([tp, &run_task] { run_task(*tp); });
        }
        pool->wait();
    } else {
        for (auto& t : tasks) run_task(t);
    }

    // -- step 5: pruning (ref: 207-247): the splice roots are the
    //    highest nodes whose half-area drops below ratio x the average
    //    mini-tree root area (or leaves); every ancestor above a splice
    //    root dissolves into the top tree.
    T avg_area = T(0);
    for (auto& t : tasks) avg_area += t.tree.nodes[0].box().half_area();
    avg_area /= T(tasks.size());
    const T thr = avg_area * kPruneRatio;
    struct SRoot { uint32_t task; uint32_t node; };
    std::vector<SRoot> sroots;
    std::vector<uint8_t> anc_ok;
    size_t total_nodes = 0;
    for (size_t k = 0; k < tasks.size(); ++k) {
        auto& tree = tasks[k].tree;
        total_nodes += tree.nodes.size();
        // children always have larger slot ids than their parent in the
        // work-stack builders, so one forward pass propagates
        // "every ancestor is above the threshold"
        anc_ok.assign(tree.nodes.size(), 0);
        anc_ok[0] = 1;
        for (size_t i = 0; i < tree.nodes.size(); ++i) {
            auto& nd = tree.nodes[i];
            bool big = nd.box().half_area() >= thr;
            if (anc_ok[i] && (!big || nd.is_leaf()))
                sroots.push_back({uint32_t(k), uint32_t(i)});
            if (!nd.is_leaf()) {
                uint8_t v = anc_ok[i] && big;
                anc_ok[nd.first_id() + 0] = v;
                anc_ok[nd.first_id() + 1] = v;
            }
        }
    }

    // -- step 6: sweep top tree over the splice roots (ref: 249-261) ---
    const size_t S = sroots.size();
    std::vector<Box<T, Dim>> tboxes(S);
    std::vector<VecN<T, Dim>> tcenters(S);
    for (size_t s = 0; s < S; ++s) {
        auto b = tasks[sroots[s].task].tree.nodes[sroots[s].node].box();
        tboxes[s] = b;
        for (int a = 0; a < Dim; ++a)
            tcenters[s][a] = (b.mn[a] + b.mx[a]) / T(2);
    }
    BuildInput<T, Dim> tin{tboxes.data(), tcenters.data(), S, 1, 1};
    Bvh top = build_sweep(tin);

    // -- splice (ref: 262-308): top leaves become the splice roots;
    //    subtrees append below with first-child/prim offsets remapped.
    Bvh out;
    out.prim_ids.resize(in.n);
    for (auto& t : tasks)
        for (size_t i = 0; i < t.end - t.begin; ++i)
            out.prim_ids[t.begin + i] =
                sorted_ids[t.begin + size_t(t.tree.prim_ids[i])];
    out.nodes = std::move(top.nodes);
    out.nodes.reserve(out.nodes.size() + total_nodes);
    struct Copy { uint32_t task; uint32_t src; size_t dst; };
    std::vector<Copy> stk;
    for (size_t i = 0; i < out.nodes.size(); ++i) {
        if (!out.nodes[i].is_leaf()) continue;
        auto& sr = sroots[size_t(top.prim_ids[out.nodes[i].first_id()])];
        stk.push_back({sr.task, sr.node, i});
    }
    while (!stk.empty()) {
        auto [k, src, dst] = stk.back();
        stk.pop_back();
        auto& t = tasks[k];
        auto nd = t.tree.nodes[src];
        if (nd.is_leaf()) {
            nd.index = Node::leaf(t.begin + nd.first_id(), nd.count());
            out.nodes[dst] = nd;
        } else {
            size_t c = out.nodes.size();
            out.nodes.emplace_back();
            out.nodes.emplace_back();
            uint32_t l = uint32_t(nd.first_id());
            nd.index = Node::inner(c);
            out.nodes[dst] = nd;
            stk.push_back({k, l + 0, c + 0});
            stk.push_back({k, l + 1, c + 1});
        }
    }
    return out;
}

// ------------------------------------------------ reinsertion optimizer
template <typename T, int Dim>
void optimize(FlatBvh<T, Dim>& bvh, Pool* pool) {
    using Node = typename FlatBvh<T, Dim>::Node;
    const size_t n = bvh.nodes.size();
    if (n < 7) return;
    std::vector<size_t> parents(n, 0);
    auto rebuild_parents = [&] {
        for (size_t i = 0; i < n; ++i)
            if (!bvh.nodes[i].is_leaf()) {
                parents[bvh.nodes[i].first_id() + 0] = i;
                parents[bvh.nodes[i].first_id() + 1] = i;
            }
    };
    rebuild_parents();

    auto sibling = [](size_t i) { return i % 2 == 1 ? i + 1 : i - 1; };
    auto left_sibling = [](size_t i) { return i % 2 == 1 ? i : i - 1; };

    struct Move { size_t from = 0, to = 0; T gain = 0; };
    auto find_move = [&](size_t from) -> Move {
        Move best{from, 0, 0};
        T node_area = bvh.nodes[from].box().half_area();
        size_t parent = parents[from];
        T area_diff = bvh.nodes[parent].box().half_area();
        size_t sib = sibling(from), pivot = parent;
        auto pivot_box = bvh.nodes[sib].box();
        std::vector<std::pair<T, size_t>> stack;
        for (;;) {
            stack.emplace_back(area_diff, sib);
            while (!stack.empty()) {
                auto [bound, id] = stack.back();
                stack.pop_back();
                if (bound - node_area <= best.gain) continue;
                auto merged = bvh.nodes[id].box();
                merged.grow(bvh.nodes[from].box());
                T gain = bound - merged.half_area();
                if (gain > best.gain) { best.to = id; best.gain = gain; }
                if (!bvh.nodes[id].is_leaf()) {
                    T child_bound = gain + bvh.nodes[id].box().half_area();
                    stack.emplace_back(child_bound, bvh.nodes[id].first_id() + 0);
                    stack.emplace_back(child_bound, bvh.nodes[id].first_id() + 1);
                }
            }
            if (pivot != parent) {
                pivot_box.grow(bvh.nodes[sib].box());
                area_diff += bvh.nodes[pivot].box().half_area() - pivot_box.half_area();
            }
            sib = sibling(pivot);
            size_t next = parents[pivot];
            if (pivot == 0 || next == pivot) break;
            pivot = next;
            if (pivot == 0) break;
        }
        if (best.to == sibling(from) || best.to == parents[from]) return {from, 0, 0};
        return best;
    };

    auto refit_from = [&](size_t i) {
        for (;;) {
            auto& node = bvh.nodes[i];
            if (!node.is_leaf()) {
                auto b = bvh.nodes[node.first_id()].box();
                b.grow(bvh.nodes[node.first_id() + 1].box());
                node.set_box(b);
            }
            if (i == 0) break;
            i = parents[i];
        }
    };

    const size_t batch = std::max<size_t>(1, n / 20);  // 5%
    std::vector<std::pair<T, size_t>> by_area(n - 1);
    std::vector<Move> moves;
    std::vector<uint8_t> touched(n);
    for (int iter = 0; iter < 3; ++iter) {
        for (size_t i = 1; i < n; ++i)
            by_area[i - 1] = {bvh.nodes[i].box().half_area(), i};
        size_t take = std::min(batch, by_area.size());
        std::partial_sort(by_area.begin(), by_area.begin() + take, by_area.end(),
                          std::greater<>{});
        moves.assign(take, {});
        if (pool && take > 64) {
            size_t chunk = (take + pool->size() - 1) / pool->size();
            for (size_t s = 0; s < take; s += chunk) {
                size_t e = std::min(take, s + chunk);
                pool->push([&, s, e] {
                    for (size_t i = s; i < e; ++i)
                        moves[i] = find_move(by_area[i].second);
                });
            }
            pool->wait();
        } else {
            for (size_t i = 0; i < take; ++i) moves[i] = find_move(by_area[i].second);
        }
        std::sort(moves.begin(), moves.end(),
                  [](auto& a, auto& b) { return a.gain > b.gain; });
        std::fill(touched.begin(), touched.end(), 0);
        for (auto& m : moves) {
            if (m.gain <= 0) break;
            size_t conflicts[5] = {m.to, m.from, sibling(m.from), parents[m.to],
                                   parents[m.from]};
            bool clash = false;
            for (auto c : conflicts) clash |= touched[c] != 0;
            if (clash) continue;
            for (auto c : conflicts) touched[c] = 1;
            // splice: to's slot becomes inner over {from, sibling-slot
            // holding to's old content}; parent slot takes sibling.
            size_t sib = sibling(m.from), parent = parents[m.from];
            auto sib_node = bvh.nodes[sib];
            auto dst_node = bvh.nodes[m.to];
            bvh.nodes[m.to].index = Node::inner(left_sibling(m.from));
            bvh.nodes[sib] = dst_node;
            bvh.nodes[parent] = sib_node;
            if (!dst_node.is_leaf()) {
                parents[dst_node.first_id() + 0] = sib;
                parents[dst_node.first_id() + 1] = sib;
            }
            if (!sib_node.is_leaf()) {
                parents[sib_node.first_id() + 0] = parent;
                parents[sib_node.first_id() + 1] = parent;
            }
            parents[sib] = m.to;
            parents[m.from] = m.to;
            refit_from(m.to);
            refit_from(parent);
        }
    }
}

// ----------------------------------------------------------- traversal
template <typename T, int Dim, bool AnyHit, bool Robust, typename LeafFn>
void intersect(const FlatBvh<T, Dim>& bvh, T* ray, LeafFn&& leaf_fn) {
    using UInt = typename IndexWord<T>::type;
    const T* org = ray;
    const T* dir = ray + Dim;
    T tmin = ray[2 * Dim];

    T inv[Dim], inv_pad[Dim], inv_org[Dim];
    int oct[Dim];
    for (int i = 0; i < Dim; ++i) {
        if (Robust) {
            inv[i] = T(1) / dir[i];
        } else {
            // safe inverse for the fast path (reference: bvh.h:162).
            inv[i] = std::fabs(dir[i]) <= std::numeric_limits<T>::epsilon()
                         ? std::copysign(std::numeric_limits<T>::max(), dir[i])
                         : T(1) / dir[i];
        }
        UInt u;
        T p = inv[i];
        if (std::isfinite(p)) {
            std::memcpy(&u, &p, sizeof(T));
            u += 2;
            std::memcpy(&p, &u, sizeof(T));
        }
        inv_pad[i] = p;
        inv_org[i] = -inv[i] * org[i];
        oct[i] = std::signbit(dir[i]) ? 1 : 0;
    }

    auto hit_node = [&](const auto& node, T& t_enter) {
        T t0 = tmin, t1 = ray[2 * Dim + 1];
        for (int i = 0; i < Dim; ++i) {
            T lo = node.bounds[2 * i + oct[i]];
            T hi = node.bounds[2 * i + 1 - oct[i]];
            T tn, tf;
            if (Robust) {
                tn = (lo - org[i]) * inv[i];
                tf = (hi - org[i]) * inv_pad[i];
            } else {
                tn = lo * inv[i] + inv_org[i];
                tf = hi * inv[i] + inv_org[i];
            }
            t0 = rmax(tn, t0);
            t1 = rmin(tf, t1);
        }
        t_enter = t0;
        return t0 <= t1;
    };

    auto word = bvh.nodes[0].index;
    typename FlatBvh<T, Dim>::Word stack[64];
    int sp = 0;
    for (;;) {
        while ((word & kMaxPrimCount) == 0) {
            size_t first = size_t(word >> kPrimCountBits);
            const auto& l = bvh.nodes[first];
            const auto& r = bvh.nodes[first + 1];
            T tl, tr;
            bool hl = hit_node(l, tl), hr = hit_node(r, tr);
            if (hl && hr) {
                auto near = l.index, far = r.index;
                if (!AnyHit && tl > tr) std::swap(near, far);
                stack[sp++] = far;
                word = near;
            } else if (hl) {
                word = l.index;
            } else if (hr) {
                word = r.index;
            } else {
                goto pop;
            }
        }
        {
            size_t first = size_t(word >> kPrimCountBits);
            size_t count = size_t(word & kMaxPrimCount);
            bool was_hit = leaf_fn(first, first + count);
            if (AnyHit && was_hit) return;
        }
    pop:
        if (sp == 0) return;
        word = stack[--sp];
    }
}

// ---------------------------------------------------------- serialization
template <typename T, int Dim>
void save(const FlatBvh<T, Dim>& bvh, FILE* f) {
    using Word = typename FlatBvh<T, Dim>::Word;
    Word counts[2] = {Word(bvh.nodes.size()), Word(bvh.prim_ids.size())};
    fwrite(counts, sizeof(Word), 2, f);
    for (auto& node : bvh.nodes) {
        fwrite(node.bounds, sizeof(T), 2 * Dim, f);
        fwrite(&node.index, sizeof(Word), 1, f);
    }
    fwrite(bvh.prim_ids.data(), sizeof(Word), bvh.prim_ids.size(), f);
}

template <typename T, int Dim>
FlatBvh<T, Dim>* load(FILE* f) {
    using Word = typename FlatBvh<T, Dim>::Word;
    Word counts[2];
    if (fread(counts, sizeof(Word), 2, f) != 2) return nullptr;
    auto* bvh = new FlatBvh<T, Dim>();
    bvh->nodes.resize(size_t(counts[0]));
    bvh->prim_ids.resize(size_t(counts[1]));
    for (auto& node : bvh->nodes) {
        if (fread(node.bounds, sizeof(T), 2 * Dim, f) != size_t(2 * Dim) ||
            fread(&node.index, sizeof(Word), 1, f) != 1) {
            delete bvh;
            return nullptr;
        }
    }
    if (!bvh->prim_ids.empty() &&
        fread(bvh->prim_ids.data(), sizeof(Word), bvh->prim_ids.size(), f) !=
            bvh->prim_ids.size()) {
        delete bvh;
        return nullptr;
    }
    return bvh;
}

// -------------------------------------------------------------- refit
template <typename T, int Dim>
void refit(FlatBvh<T, Dim>& bvh) {
    const size_t n = bvh.nodes.size();
    std::vector<size_t> parents(n, 0);
    for (size_t i = 0; i < n; ++i)
        if (!bvh.nodes[i].is_leaf()) {
            parents[bvh.nodes[i].first_id() + 0] = i;
            parents[bvh.nodes[i].first_id() + 1] = i;
        }
    std::vector<uint8_t> seen(n, 0);
    for (size_t i = n; i-- > 0;) {
        if (!bvh.nodes[i].is_leaf()) continue;
        seen[i] = 1;
        for (size_t j = parents[i];; j = parents[j]) {
            auto& node = bvh.nodes[j];
            if (seen[j] || !seen[node.first_id()] || !seen[node.first_id() + 1]) break;
            auto b = bvh.nodes[node.first_id()].box();
            b.grow(bvh.nodes[node.first_id() + 1].box());
            node.set_box(b);
            seen[j] = 1;
            if (j == 0) break;
        }
    }
}

template <typename T, int Dim>
FlatBvh<T, Dim>* do_build(Pool* pool, const Box<T, Dim>* boxes,
                          const VecN<T, Dim>* centers, size_t n,
                          const bvh_build_config* config) {
    bvh_build_config def{BVH_BUILD_QUALITY_HIGH, 1, 8, 1024};
    if (!config) config = &def;
    BuildInput<T, Dim> in{boxes, centers, n,
                          std::max<size_t>(1, config->min_leaf_size),
                          std::min<size_t>(kMaxPrimCount,
                                           std::max<size_t>(1, config->max_leaf_size))};
    auto* bvh = new FlatBvh<T, Dim>();
    if (config->quality == BVH_BUILD_QUALITY_LOW)
        *bvh = build_binned(in);
    else if (pool)
        // a non-NULL pool selects the parallel mini-tree pipeline, the
        // reference's default-builder behavior (default_builder.h:33-46,
        // c_api/bvh_impl.h:105-114)
        *bvh = build_minitree(in, pool, config->parallel_threshold);
    else
        *bvh = build_sweep(in);
    if (config->quality == BVH_BUILD_QUALITY_HIGH) optimize(*bvh, pool);
    return bvh;
}

}  // namespace

// ------------------------------------------------------------ C surface
extern "C" {

struct bvh_thread_pool* bvh_thread_pool_create(size_t thread_count) {
    return reinterpret_cast<bvh_thread_pool*>(new Pool(thread_count));
}
void bvh_thread_pool_destroy(struct bvh_thread_pool* pool) {
    delete reinterpret_cast<Pool*>(pool);
}

#define BVH_DEFINE_API(tag, scalar, dim, vec, bbox, ray, cb)                    \
    struct bvh##tag* bvh##tag##_build(                                          \
        struct bvh_thread_pool* pool, const struct bbox* boxes,                 \
        const struct vec* centers, size_t n,                                    \
        const struct bvh_build_config* config) {                                \
        return reinterpret_cast<struct bvh##tag*>(do_build<scalar, dim>(        \
            reinterpret_cast<Pool*>(pool),                                      \
            reinterpret_cast<const Box<scalar, dim>*>(boxes),                   \
            reinterpret_cast<const VecN<scalar, dim>*>(centers), n, config));   \
    }                                                                           \
    void bvh##tag##_destroy(struct bvh##tag* b) {                               \
        delete reinterpret_cast<FlatBvh<scalar, dim>*>(b);                      \
    }                                                                           \
    void bvh##tag##_save(const struct bvh##tag* b, FILE* f) {                   \
        save(*reinterpret_cast<const FlatBvh<scalar, dim>*>(b), f);             \
    }                                                                           \
    struct bvh##tag* bvh##tag##_load(FILE* f) {                                 \
        return reinterpret_cast<struct bvh##tag*>(load<scalar, dim>(f));        \
    }                                                                           \
    size_t bvh##tag##_get_node_count(const struct bvh##tag* b) {                \
        return reinterpret_cast<const FlatBvh<scalar, dim>*>(b)->nodes.size();  \
    }                                                                           \
    size_t bvh##tag##_get_prim_count(const struct bvh##tag* b) {                \
        return reinterpret_cast<const FlatBvh<scalar, dim>*>(b)->prim_ids.size(); \
    }                                                                           \
    size_t bvh##tag##_get_prim_id(const struct bvh##tag* b, size_t i) {         \
        return size_t(                                                          \
            reinterpret_cast<const FlatBvh<scalar, dim>*>(b)->prim_ids[i]);     \
    }                                                                           \
    struct bvh_node##tag* bvh##tag##_get_node(struct bvh##tag* b, size_t i) {   \
        return reinterpret_cast<struct bvh_node##tag*>(                         \
            &reinterpret_cast<FlatBvh<scalar, dim>*>(b)->nodes[i]);             \
    }                                                                           \
    void bvh_node##tag##_get_bbox(const struct bvh_node##tag* node,             \
                                  struct bbox* out) {                           \
        auto box =                                                              \
            reinterpret_cast<const FlatBvh<scalar, dim>::Node*>(node)->box();   \
        std::memcpy(&out->min, box.mn.v, sizeof(scalar) * dim);                 \
        std::memcpy(&out->max, box.mx.v, sizeof(scalar) * dim);                 \
    }                                                                           \
    void bvh_node##tag##_set_bbox(struct bvh_node##tag* node,                   \
                                  const struct bbox* in) {                      \
        Box<scalar, dim> box;                                                   \
        std::memcpy(box.mn.v, &in->min, sizeof(scalar) * dim);                  \
        std::memcpy(box.mx.v, &in->max, sizeof(scalar) * dim);                  \
        reinterpret_cast<FlatBvh<scalar, dim>::Node*>(node)->set_box(box);      \
    }                                                                           \
    bool bvh_node##tag##_is_leaf(const struct bvh_node##tag* node) {            \
        return reinterpret_cast<const FlatBvh<scalar, dim>::Node*>(node)        \
            ->is_leaf();                                                        \
    }                                                                           \
    size_t bvh_node##tag##_get_first_id(const struct bvh_node##tag* node) {     \
        return reinterpret_cast<const FlatBvh<scalar, dim>::Node*>(node)        \
            ->first_id();                                                       \
    }                                                                           \
    size_t bvh_node##tag##_get_prim_count(const struct bvh_node##tag* node) {   \
        return reinterpret_cast<const FlatBvh<scalar, dim>::Node*>(node)        \
            ->count();                                                          \
    }                                                                           \
    struct bvh_node##tag* bvh##tag##_append_node(struct bvh##tag* b) {          \
        auto* bvh = reinterpret_cast<FlatBvh<scalar, dim>*>(b);                 \
        bvh->nodes.emplace_back();                                              \
        return reinterpret_cast<struct bvh_node##tag*>(&bvh->nodes.back());     \
    }                                                                           \
    void bvh##tag##_remove_last_node(struct bvh##tag* b) {                      \
        auto* bvh = reinterpret_cast<FlatBvh<scalar, dim>*>(b);                 \
        if (bvh->nodes.size() > 1) bvh->nodes.pop_back();                       \
    }                                                                           \
    void bvh##tag##_refit(struct bvh##tag* b) {                                 \
        refit(*reinterpret_cast<FlatBvh<scalar, dim>*>(b));                     \
    }                                                                           \
    void bvh##tag##_optimize(struct bvh_thread_pool* pool, struct bvh##tag* b) {\
        optimize(*reinterpret_cast<FlatBvh<scalar, dim>*>(b),                   \
                 reinterpret_cast<Pool*>(pool));                                \
    }                                                                           \
    void bvh##tag##_intersect_ray(const struct bvh##tag* b,                     \
                                  const struct ray* r, const struct cb* c) {    \
        scalar tmp[2 * dim + 2];                                                \
        std::memcpy(tmp, r, sizeof(tmp));                                       \
        intersect<scalar, dim, false, false>(                                   \
            *reinterpret_cast<const FlatBvh<scalar, dim>*>(b), tmp,             \
            [&](size_t begin, size_t end) {                                     \
                return c->user_fn(c->user_data, tmp, begin, end);               \
            });                                                                 \
    }                                                                           \
    void bvh##tag##_intersect_ray_robust(const struct bvh##tag* b,              \
                                         const struct ray* r,                   \
                                         const struct cb* c) {                  \
        scalar tmp[2 * dim + 2];                                                \
        std::memcpy(tmp, r, sizeof(tmp));                                       \
        intersect<scalar, dim, false, true>(                                    \
            *reinterpret_cast<const FlatBvh<scalar, dim>*>(b), tmp,             \
            [&](size_t begin, size_t end) {                                     \
                return c->user_fn(c->user_data, tmp, begin, end);               \
            });                                                                 \
    }                                                                           \
    void bvh##tag##_intersect_ray_any(const struct bvh##tag* b,                 \
                                      const struct ray* r, const struct cb* c) {\
        scalar tmp[2 * dim + 2];                                                \
        std::memcpy(tmp, r, sizeof(tmp));                                       \
        intersect<scalar, dim, true, false>(                                    \
            *reinterpret_cast<const FlatBvh<scalar, dim>*>(b), tmp,             \
            [&](size_t begin, size_t end) {                                     \
                return c->user_fn(c->user_data, tmp, begin, end);               \
            });                                                                 \
    }                                                                           \
    void bvh##tag##_intersect_ray_any_robust(const struct bvh##tag* b,          \
                                             const struct ray* r,               \
                                             const struct cb* c) {              \
        scalar tmp[2 * dim + 2];                                                \
        std::memcpy(tmp, r, sizeof(tmp));                                       \
        intersect<scalar, dim, true, true>(                                     \
            *reinterpret_cast<const FlatBvh<scalar, dim>*>(b), tmp,             \
            [&](size_t begin, size_t end) {                                     \
                return c->user_fn(c->user_data, tmp, begin, end);               \
            });                                                                 \
    }

BVH_DEFINE_API(2f, float, 2, bvh_vec2f, bvh_bbox2f, bvh_ray2f, bvh_intersect_callbackf)
BVH_DEFINE_API(3f, float, 3, bvh_vec3f, bvh_bbox3f, bvh_ray3f, bvh_intersect_callbackf)
BVH_DEFINE_API(2d, double, 2, bvh_vec2d, bvh_bbox2d, bvh_ray2d, bvh_intersect_callbackd)
BVH_DEFINE_API(3d, double, 3, bvh_vec3d, bvh_bbox3d, bvh_ray3d, bvh_intersect_callbackd)

// ------------------------------------------------------------ OBJ loader
bvh_tri3f* bvh_load_obj(const char* file_name, size_t* tri_count) {
    *tri_count = 0;
    FILE* f = fopen(file_name, "r");
    if (!f) return nullptr;
    std::vector<bvh_vec3f> verts;
    std::vector<bvh_tri3f> tris;
    char line[1024];
    while (fgets(line, sizeof(line), f)) {
        char* p = line;
        while (*p == ' ' || *p == '\t') ++p;
        if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            bvh_vec3f v;
            if (sscanf(p + 1, "%f %f %f", &v.x, &v.y, &v.z) == 3)
                verts.push_back(v);
        } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
            std::vector<long> idx;
            char* q = p + 1;
            while (*q) {
                while (*q == ' ' || *q == '\t') ++q;
                if (!isdigit((unsigned char)*q) && *q != '-') break;
                long i = strtol(q, &q, 10);
                idx.push_back(i < 0 ? long(verts.size()) + i : i - 1);
                while (*q && *q != ' ' && *q != '\t' && *q != '\n') ++q;  // skip /vt/vn
            }
            for (size_t k = 2; k < idx.size(); ++k) {
                bvh_tri3f t;
                t.v[0] = verts[idx[0]];
                t.v[1] = verts[idx[k - 1]];
                t.v[2] = verts[idx[k]];
                tris.push_back(t);
            }
        }
    }
    fclose(f);
    if (tris.empty()) return nullptr;
    auto* out = (bvh_tri3f*)malloc(sizeof(bvh_tri3f) * tris.size());
    std::memcpy(out, tris.data(), sizeof(bvh_tri3f) * tris.size());
    *tri_count = tris.size();
    return out;
}

}  // extern "C"
