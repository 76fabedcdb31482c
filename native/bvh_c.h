/* bvh_tpu native C API.
 *
 * C-callable runtime companion to the bvh_tpu JAX framework: the same
 * functional surface as the reference C API (reference:
 * src/bvh/v2/c_api/bvh.h) — build / destroy / save / load / node
 * accessors / append & remove node / refit / optimize and four
 * intersect variants driven by a user callback — over the same flat
 * node layout and v2 serialization bytes, so handles round-trip with
 * BVHs written by the JAX side or by the C++ reference.
 *
 * This is an original implementation (no code shared with the
 * reference); the symbol names and call contracts match so pure-C
 * consumers of the reference can switch by relinking.
 */
#ifndef BVH_TPU_NATIVE_C_H
#define BVH_TPU_NATIVE_C_H

#include <stdbool.h>
#include <stddef.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

#define BVH_API __attribute__((visibility("default")))

/* reference: c_api/bvh.h:32-33 */
#define BVH_ROOT_INDEX 0
#define BVH_INVALID_PRIM_ID ((size_t)-1)

struct bvh2f; struct bvh3f; struct bvh2d; struct bvh3d;
struct bvh_node2f; struct bvh_node3f; struct bvh_node2d; struct bvh_node3d;
struct bvh_thread_pool;

enum bvh_build_quality {
    BVH_BUILD_QUALITY_LOW,
    BVH_BUILD_QUALITY_MEDIUM,
    BVH_BUILD_QUALITY_HIGH
};

/* reference: c_api/bvh.h:47-58 */
struct bvh_build_config {
    enum bvh_build_quality quality;
    size_t min_leaf_size;
    size_t max_leaf_size;
    size_t parallel_threshold;
};

struct bvh_vec2f { float x, y; };
struct bvh_vec3f { float x, y, z; };
struct bvh_vec2d { double x, y; };
struct bvh_vec3d { double x, y, z; };

struct bvh_bbox2f { struct bvh_vec2f min, max; };
struct bvh_bbox3f { struct bvh_vec3f min, max; };
struct bvh_bbox2d { struct bvh_vec2d min, max; };
struct bvh_bbox3d { struct bvh_vec3d min, max; };

struct bvh_ray2f { struct bvh_vec2f org, dir; float tmin, tmax; };
struct bvh_ray3f { struct bvh_vec3f org, dir; float tmin, tmax; };
struct bvh_ray2d { struct bvh_vec2d org, dir; double tmin, tmax; };
struct bvh_ray3d { struct bvh_vec3d org, dir; double tmin, tmax; };

/* Leaf callback: begin/end are positions into the BVH's prim id array
 * (reference contract: c_api/bvh.h:233-274). The second argument points
 * at the ray as a flat scalar array {org[dim], dir[dim], tmin, tmax};
 * writing a smaller tmax shortens the ray and culls farther nodes.
 * Return true to report a hit (terminates any-hit traversal). */
struct bvh_intersect_callbackf {
    void* user_data;
    bool (*user_fn)(void* user_data, float* ray, size_t begin, size_t end);
};
struct bvh_intersect_callbackd {
    void* user_data;
    bool (*user_fn)(void* user_data, double* ray, size_t begin, size_t end);
};

BVH_API struct bvh_thread_pool* bvh_thread_pool_create(size_t thread_count);
BVH_API void bvh_thread_pool_destroy(struct bvh_thread_pool*);

#define BVH_DECLARE_API(tag, scalar, vec, bbox, ray, cb)                        \
    BVH_API struct bvh##tag* bvh##tag##_build(                                  \
        struct bvh_thread_pool*, const struct bbox*, const struct vec*,         \
        size_t prim_count, const struct bvh_build_config*);                     \
    BVH_API void bvh##tag##_destroy(struct bvh##tag*);                          \
    BVH_API void bvh##tag##_save(const struct bvh##tag*, FILE*);                \
    BVH_API struct bvh##tag* bvh##tag##_load(FILE*);                            \
    BVH_API size_t bvh##tag##_get_node_count(const struct bvh##tag*);           \
    BVH_API size_t bvh##tag##_get_prim_count(const struct bvh##tag*);           \
    BVH_API size_t bvh##tag##_get_prim_id(const struct bvh##tag*, size_t i);    \
    BVH_API struct bvh_node##tag* bvh##tag##_get_node(struct bvh##tag*, size_t);\
    BVH_API void bvh_node##tag##_get_bbox(const struct bvh_node##tag*,          \
                                          struct bbox*);                        \
    BVH_API void bvh_node##tag##_set_bbox(struct bvh_node##tag*,                \
                                          const struct bbox*);                  \
    BVH_API bool bvh_node##tag##_is_leaf(const struct bvh_node##tag*);          \
    BVH_API size_t bvh_node##tag##_get_first_id(const struct bvh_node##tag*);   \
    BVH_API size_t bvh_node##tag##_get_prim_count(const struct bvh_node##tag*); \
    BVH_API struct bvh_node##tag* bvh##tag##_append_node(struct bvh##tag*);     \
    BVH_API void bvh##tag##_remove_last_node(struct bvh##tag*);                 \
    BVH_API void bvh##tag##_refit(struct bvh##tag*);                            \
    BVH_API void bvh##tag##_optimize(struct bvh_thread_pool*, struct bvh##tag*);\
    BVH_API void bvh##tag##_intersect_ray(const struct bvh##tag*,               \
        const struct ray*, const struct cb*);                                   \
    BVH_API void bvh##tag##_intersect_ray_robust(const struct bvh##tag*,        \
        const struct ray*, const struct cb*);                                   \
    BVH_API void bvh##tag##_intersect_ray_any(const struct bvh##tag*,           \
        const struct ray*, const struct cb*);                                   \
    BVH_API void bvh##tag##_intersect_ray_any_robust(const struct bvh##tag*,    \
        const struct ray*, const struct cb*);

BVH_DECLARE_API(2f, float, bvh_vec2f, bvh_bbox2f, bvh_ray2f, bvh_intersect_callbackf)
BVH_DECLARE_API(3f, float, bvh_vec3f, bvh_bbox3f, bvh_ray3f, bvh_intersect_callbackf)
BVH_DECLARE_API(2d, double, bvh_vec2d, bvh_bbox2d, bvh_ray2d, bvh_intersect_callbackd)
BVH_DECLARE_API(3d, double, bvh_vec3d, bvh_bbox3d, bvh_ray3d, bvh_intersect_callbackd)

#undef BVH_DECLARE_API

/* OBJ loader test utility export (reference: test/load_obj.cpp:116-138) */
typedef struct { struct bvh_vec3f v[3]; } bvh_tri3f;
BVH_API bvh_tri3f* bvh_load_obj(const char* file_name, size_t* tri_count);

#ifdef __cplusplus
}
#endif
#endif
