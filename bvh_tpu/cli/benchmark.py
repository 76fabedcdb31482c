"""Benchmark / renderer CLI, flag-compatible with the reference
benchmark tool (reference: test/benchmark.cpp:36-58 for the options,
340-436 for the pipeline): loads an OBJ, builds a BVH at the requested
quality, renders WxH primary rays (eyelight shading, or a traversal
heat map in debug mode), reports build/render times and intersection
counts, and writes a PPM (rows bottom-up like the reference's
Image::save, benchmark.cpp:250-255).

Usage: python -m bvh_tpu.cli.benchmark [options] file.obj
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def profile(fn, iters: int = 1):
    """Median-of-N wall-clock timing (reference: benchmark.cpp:60-71).
    Returns (result, seconds)."""
    times = []
    result = None
    for _ in range(max(1, iters)):
        start = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - start)
    times.sort()
    return result, times[len(times) // 2]


def intensity_to_color(t):
    """Heat-map ramp for debug mode (mirrors benchmark.cpp's
    intensity_to_color inferno-style ramp in spirit)."""
    t = np.clip(t, 0.0, 1.0)
    r = np.clip(1.5 * t, 0, 1)
    g = np.clip(1.5 * (t - 0.33), 0, 1)
    b = np.clip(1.5 * (t - 0.66), 0, 1)
    return np.stack([r, g, b], axis=-1)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="benchmark", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("input_model")
    p.add_argument("-q", "--quality", choices=["low", "med", "medium", "high"],
                   default="high")
    p.add_argument("-p", "--permute-primitives", action="store_true",
                   dest="permute_prims")
    p.add_argument("-i", "--build-iterations", type=int, default=1)
    p.add_argument("--robust-traversal", action="store_true")
    p.add_argument("-e", "--eye", nargs=3, type=float, default=[0, 0, 0])
    p.add_argument("-d", "--dir", nargs=3, type=float, default=[0, 0, 1])
    p.add_argument("-u", "--up", nargs=3, type=float, default=[0, 1, 0])
    p.add_argument("--fov", type=float, default=None,
                   help="accepted for reference flag parity; unused, as in the reference")
    p.add_argument("-w", "--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("-m", "--render-mode", choices=["eyelight", "debug"],
                   default="eyelight")
    p.add_argument("-o", "--output", default="render.ppm")
    p.add_argument("--debug-threshold", type=int, default=0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from bvh_tpu.api.flat import BuildConfig, bvh3f
    from bvh_tpu.build.default import Quality
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.obj import load_obj
    from bvh_tpu.io.ppm import save_ppm
    from bvh_tpu.traverse.wavefront import intersect_tris

    try:
        p0, p1, p2 = load_obj(args.input_model)
    except OSError:
        # The reference's loader returns an empty triangle list for
        # unreadable files (load_obj.cpp:99-104) -> same message + exit 1.
        p0 = []
    if len(p0) == 0:
        print("No triangle was found in input OBJ file", file=sys.stderr)
        return 1
    print(f"Loaded file with {len(p0)} triangle(s)")

    tri = Tri(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    bb_min, bb_max = tri.get_bbox()
    centers = tri.get_center()
    quality = {"low": Quality.LOW, "med": Quality.MEDIUM,
               "medium": Quality.MEDIUM, "high": Quality.HIGH}[args.quality]
    config = BuildConfig(quality=quality)

    def do_build():
        bvh = bvh3f.build(bb_min, bb_max, centers, config)
        bvh.index.block_until_ready()
        return bvh

    bvh, build_s = profile(do_build, args.build_iterations)
    print(f"Built BVH with {int(bvh.node_count)} node(s) in {build_s * 1e3:.0f}ms")

    # Not needed, just for testing (reference: benchmark.cpp:420).
    bvh = bvh3f.refit(bvh, bb_min, bb_max)

    flat = PrecomputedTri.from_tri(tri).as_flat()
    if args.permute_prims:
        flat = flat[jnp.asarray(np.asarray(bvh.prim_ids).astype(np.int64))]

    rays = primary_rays(args.eye, args.dir, args.up, args.width, args.height)

    # Accelerator path selection: VMEM-scale scenes take the
    # single-launch Pallas kernel; larger 3D/f32 scenes take the
    # wide-treelet two-phase path; everything else (CPU, 2D/4D, f64)
    # uses the XLA wavefront (PERFORMANCE.md).
    import jax

    from bvh_tpu.traverse.pallas_kernel import pallas_fits, pallas_intersect_tris

    on_accel = jax.devices()[0].platform != "cpu"
    use_pallas = on_accel and pallas_fits(bvh, flat)
    use_wide = (
        on_accel
        and not use_pallas
        and bvh.dim == 3
        and bvh.bounds.dtype == jnp.float32
    )
    if use_pallas:
        def do_render():
            hit = pallas_intersect_tris(
                bvh, flat, rays,
                robust=args.robust_traversal,
                permuted=args.permute_prims,
                block=8192,
            )
            hit.t.block_until_ready()
            return hit
    elif use_wide:
        from bvh_tpu.traverse.wide_treelet import (
            build_wide_treelets,
            wide_treelet_intersect_tris,
        )

        tl = build_wide_treelets(bvh, flat, permuted=args.permute_prims,
                                 max_prims=1024)
        wide_prim_ids = (None if args.permute_prims
                         else np.asarray(bvh.prim_ids))

        def do_render():
            hit = wide_treelet_intersect_tris(
                tl, rays,
                robust=args.robust_traversal,
                prim_ids=wide_prim_ids,
            )
            float(hit.t[0])  # sync (block_until_ready lies here)
            return hit
    else:
        def do_render():
            hit = intersect_tris(
                bvh, flat, rays,
                robust=args.robust_traversal,
                permuted=args.permute_prims,
            )
            hit.t.block_until_ready()
            return hit

    hit, render_s = profile(do_render)
    n_hits = int(np.asarray(hit.hit).sum())
    print(f"{n_hits} intersection(s) found in {render_s * 1e3:.0f}ms")

    W, H = args.width, args.height
    if args.render_mode == "eyelight":
        # intensity = |dot(normalize(n), ray.dir)| (benchmark.cpp:363-366).
        tri_idx = np.asarray(hit.prim_id)
        tri_idx = np.where(tri_idx == 0xFFFFFFFF, 0, tri_idx).astype(np.int64)
        if args.permute_prims:
            pos = np.asarray(hit.prim_pos)
            tri_idx = np.where(pos == 0xFFFFFFFF, 0, pos).astype(np.int64)
        n_vec = np.asarray(flat)[tri_idx, 9:12]
        n_vec = n_vec / np.maximum(np.linalg.norm(n_vec, axis=-1, keepdims=True), 1e-30)
        d = np.asarray(rays.dir)
        intensity = np.abs(np.sum(n_vec * d, axis=-1))
        intensity = np.where(np.asarray(hit.hit), intensity, 0.0)
        pix = np.clip((intensity * 256).astype(np.int32), 0, 255).astype(np.uint8)
        img = np.repeat(pix.reshape(H, W, 1), 3, axis=2)
    else:
        steps = np.asarray(hit.stats.visited_nodes) + np.asarray(hit.stats.visited_leaves)
        total_nodes = int(np.asarray(hit.stats.visited_nodes).sum())
        total_leaves = int(np.asarray(hit.stats.visited_leaves).sum())
        print(f"Traversal visited {total_nodes} nodes and {total_leaves} leaves")
        thr = args.debug_threshold or max(1, int(steps.max()))
        img = (intensity_to_color(steps.reshape(H, W) / thr) * 255).astype(np.uint8)

    save_ppm(args.output, img[::-1])  # bottom-up rows (benchmark.cpp:252-254)
    print(f"Image saved as '{args.output}'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
