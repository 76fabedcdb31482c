"""Pure on-device render time: chain the whole jitted render x4 inside
one jit, one sync at the end."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
    return x


def main():
    n = 262_144
    rayside = 1024
    from bvh_tpu.api.native import NativeBvh3f, load_library
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.io.serialize import load_bvh
    from bvh_tpu.traverse import wide_treelet as wt

    tris = sponza_class(n, seed=0)
    cache = f"/tmp/bench_sponza_{n}.bvh"
    if not os.path.exists(cache):
        nat = NativeBvh3f(load_library())
        h = nat.build(tris.min(axis=1), tris.max(axis=1),
                      tris.mean(axis=1), quality=2)
        nat.save(h, cache)
        nat.destroy(h)
    bvh = load_bvh(cache)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, rayside, rayside)
    R = rayside * rayside

    tl = wt.build_wide_treelets(
        bvh, flat, max_prims=int(os.environ.get("WT_MAX_PRIMS", 1024)))
    block = int(os.environ.get("WT_BLOCK", 1024))
    top_block = int(os.environ.get("WT_TOP_BLOCK", 8192))
    Rp = wt._round_up(R, wt._lcm(block, top_block))
    sel_cap = Rp // int(os.environ.get("WT_SEL_DIV", 8))
    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    packed = jnp.asarray(packed)

    ktab = (jax.jit(wt.pack_kernel_table)(
        tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
        if tl.table.shape[2] >= wt.PACK_MIN_P else tl.table)
    inner = partial(
        wt._render_jit, top_root=tl.top_root, any_hit=False, robust=False,
        block=block,
        tail_block=int(os.environ.get("WT_TAIL_BLOCK", 256)),
        top_block=top_block, top_stack=16,
        stack_depth=24, max_portals=32,
        max_rounds=int(os.environ.get("WT_MAX_ROUNDS", 64)),
        sel_cap=sel_cap,
        portals_per_round=int(os.environ.get("WT_K", 4)), interpret=False)

    @jax.jit
    def render4(top_node_t, table, packed):
        def body(i, c):
            bt = inner(top_node_t, table, c)[0]
            return c - jnp.nan_to_num(bt[0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, packed)

    @jax.jit
    def render1(top_node_t, table, packed):
        return inner(top_node_t, table, packed)[0]

    for name, fn in (("render x1", render1), ("render x4", render4)):
        sync(fn(tl.top_node_t, ktab, packed))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(fn(tl.top_node_t, ktab, packed))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: median {ts[2]*1e3:.1f} ms  min {ts[0]*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
