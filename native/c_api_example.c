/* Pure-C consumer of the native bvh_c library: the counterpart of the
 * reference's c_api_example (reference: test/c_api_example.c) — loads
 * an OBJ, builds a BVH through the C surface, renders an eyelight
 * image with closest-hit callbacks, and writes a PPM. Exit code 0 on
 * success, 1 on failure.
 *
 * Build:
 *   make -C native example && ./native/c_api_example scene.obj out.ppm
 */
#include "bvh_c.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct bvh_vec3f v3;

static v3 v3_sub(v3 a, v3 b) { v3 r = {a.x - b.x, a.y - b.y, a.z - b.z}; return r; }
static v3 v3_add(v3 a, v3 b) { v3 r = {a.x + b.x, a.y + b.y, a.z + b.z}; return r; }
static v3 v3_scale(v3 a, float s) { v3 r = {a.x * s, a.y * s, a.z * s}; return r; }
static float v3_dot(v3 a, v3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static v3 v3_cross(v3 a, v3 b) {
    v3 r = {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
    return r;
}
static v3 v3_norm(v3 a) { return v3_scale(a, 1.0f / sqrtf(v3_dot(a, a))); }

struct hit_ctx {
    const bvh_tri3f* tris;
    const struct bvh3f* bvh;
    size_t prim;
    float u, v;
};

static bool leaf_fn(void* user, float* ray, size_t begin, size_t end) {
    struct hit_ctx* ctx = (struct hit_ctx*)user;
    v3 org = {ray[0], ray[1], ray[2]};
    v3 dir = {ray[3], ray[4], ray[5]};
    bool any = false;
    for (size_t i = begin; i < end; ++i) {
        size_t id = bvh3f_get_prim_id((struct bvh3f*)ctx->bvh, i);
        const bvh_tri3f* t = &ctx->tris[id];
        v3 e1 = v3_sub(t->v[0], t->v[1]);
        v3 e2 = v3_sub(t->v[2], t->v[0]);
        v3 n = v3_cross(e1, e2);
        v3 c = v3_sub(t->v[0], org);
        v3 r = v3_cross(dir, c);
        float inv_det = 1.0f / v3_dot(n, dir);
        float u = v3_dot(r, e2) * inv_det;
        float v = v3_dot(r, e1) * inv_det;
        float w = 1.0f - u - v;
        if (u >= 0 && v >= 0 && w >= 0) {
            float tt = v3_dot(n, c) * inv_det;
            if (tt >= ray[6] && tt <= ray[7]) {
                ray[7] = tt;  /* shorten the ray */
                ctx->prim = id;
                ctx->u = u;
                ctx->v = v;
                any = true;
            }
        }
    }
    return any;
}

int main(int argc, char** argv) {
    const char* scene = argc > 1 ? argv[1] : "scene.obj";
    const char* out = argc > 2 ? argv[2] : "render_c.ppm";
    size_t tri_count = 0;
    bvh_tri3f* tris = bvh_load_obj(scene, &tri_count);
    if (!tris) {
        fprintf(stderr, "no triangles in %s\n", scene);
        return 1;
    }
    printf("loaded %zu triangles\n", tri_count);

    struct bvh_bbox3f* boxes = malloc(sizeof(*boxes) * tri_count);
    struct bvh_vec3f* centers = malloc(sizeof(*centers) * tri_count);
    for (size_t i = 0; i < tri_count; ++i) {
        v3 mn = tris[i].v[0], mx = tris[i].v[0];
        for (int k = 1; k < 3; ++k) {
            v3 p = tris[i].v[k];
            if (p.x < mn.x) mn.x = p.x; if (p.x > mx.x) mx.x = p.x;
            if (p.y < mn.y) mn.y = p.y; if (p.y > mx.y) mx.y = p.y;
            if (p.z < mn.z) mn.z = p.z; if (p.z > mx.z) mx.z = p.z;
        }
        boxes[i].min = mn; boxes[i].max = mx;
        centers[i] = v3_scale(v3_add(v3_add(tris[i].v[0], tris[i].v[1]), tris[i].v[2]),
                              1.0f / 3.0f);
    }

    struct bvh_thread_pool* pool = bvh_thread_pool_create(0);
    struct bvh_build_config config = {BVH_BUILD_QUALITY_HIGH, 1, 8, 1024};
    struct bvh3f* bvh = bvh3f_build(pool, boxes, centers, tri_count, &config);
    printf("built %zu nodes\n", bvh3f_get_node_count(bvh));

    const int W = 256, H = 256;
    unsigned char* img = calloc((size_t)W * H * 3, 1);
    v3 eye = {0, 1, 2};
    v3 dir0 = {0, 0, -1};
    v3 up0 = {0, 1, 0};
    v3 d = v3_norm(dir0);
    v3 right = v3_norm(v3_cross(d, up0));
    v3 up = v3_cross(right, d);

    size_t hits = 0;
    for (int y = 0; y < H; ++y) {
        for (int x = 0; x < W; ++x) {
            float u = 2.0f * x / W - 1.0f;
            float v = 2.0f * y / H - 1.0f;
            struct bvh_ray3f ray;
            ray.org = eye;
            ray.dir = v3_add(d, v3_add(v3_scale(right, u), v3_scale(up, v)));
            ray.tmin = 0;
            ray.tmax = 3.4e38f;
            struct hit_ctx ctx = {tris, bvh, (size_t)-1, 0, 0};
            struct bvh_intersect_callbackf cb = {&ctx, leaf_fn};
            bvh3f_intersect_ray(bvh, &ray, &cb);
            unsigned char pix = 0;
            if (ctx.prim != (size_t)-1) {
                hits++;
                const bvh_tri3f* t = &tris[ctx.prim];
                v3 n = v3_norm(v3_cross(v3_sub(t->v[0], t->v[1]),
                                        v3_sub(t->v[2], t->v[0])));
                float inten = fabsf(v3_dot(n, ray.dir));
                int q = (int)(inten * 256.0f);
                pix = (unsigned char)(q < 0 ? 0 : q > 255 ? 255 : q);
            }
            size_t o = ((size_t)y * W + x) * 3;
            img[o] = img[o + 1] = img[o + 2] = pix;
        }
    }
    printf("%zu intersections\n", hits);

    FILE* f = fopen(out, "wb");
    fprintf(f, "P6 %d %d 255\n", W, H);
    for (int y = H - 1; y >= 0; --y)
        fwrite(img + (size_t)y * W * 3, 1, (size_t)W * 3, f);
    fclose(f);
    printf("saved %s\n", out);

    bvh3f_destroy(bvh);
    bvh_thread_pool_destroy(pool);
    free(tris); free(boxes); free(centers); free(img);
    return hits > 0 ? 0 : 1;
}
