"""Wide (8-ary) traversal must reproduce binary traversal hits."""

import os

import numpy as np
import pytest

from bvh_tpu.build.binned import build_binned
from bvh_tpu.io.serialize import load_bvh
from bvh_tpu.traverse.wide import WIDTH, intersect_tris_wide, widen
from bvh_tpu.traverse.wavefront import intersect_tris

from helpers import scene_arrays
from test_traverse import assert_hits_match, permuted_tri_flat, primary_rays


def test_widen_structure(golden_dir, cornell_tris):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    w = widen(bvh)
    m = int(w.node_count)
    assert m < int(bvh.node_count)
    words = np.asarray(w.child_index[:m])
    counts = words & 15
    first = words >> 4
    # Every leaf range of the binary tree appears exactly once.
    binary_words = np.asarray(bvh.index[: int(bvh.node_count)])
    b_leaves = sorted(binary_words[(binary_words & 15) > 0].tolist())
    w_leaves = sorted(words[counts > 0].ravel().tolist())
    assert b_leaves == w_leaves
    # Inner child words reference valid wide ids.
    inner = (counts == 0) & (np.asarray(w.child_bounds[:m, :, 0]) < 1e37)
    assert np.all(first[inner] < m)


def test_wide_hits_match_binary(golden_dir, cornell_tris, golden_hits):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    w = widen(bvh)
    rays = primary_rays()
    hit = intersect_tris_wide(w, tri_flat, rays, robust=True, permuted=True)
    assert_hits_match(
        np.asarray(hit.prim_pos), np.asarray(hit.t),
        golden_hits["prim_id"], golden_hits["t"],
        max_tie_frac=0.01,
    )


def test_wide_any_hit(golden_dir, cornell_tris, golden_anyhit):
    bvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    tri_flat = permuted_tri_flat(bvh, cornell_tris)
    w = widen(bvh)
    rays = primary_rays()
    hit = intersect_tris_wide(w, tri_flat, rays, any_hit=True, robust=True,
                              permuted=True)
    assert np.array_equal(np.asarray(hit.hit).astype(np.uint8), golden_anyhit)


@pytest.mark.slow
def test_wide_random_scene():
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    n = 3000
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.005, 0.05, (n, 3)).astype(np.float32)
    tris = np.stack([pts - ext, pts, pts + ext], axis=1)
    mn, mx, centers, flat = scene_arrays(tris)
    bvh = build_binned(mn, mx, centers)
    w = widen(bvh)
    rays_org = np.stack(
        [pts[:, 0], pts[:, 1], np.full(n, -5.0, np.float32)], axis=1
    )[:512]
    from bvh_tpu.core.ray import Ray

    rays = Ray.make(jnp.asarray(rays_org),
                    jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (512, 1)))
    a = intersect_tris(bvh, flat, rays, robust=True)
    b = intersect_tris_wide(w, flat, rays, robust=True)
    assert_hits_match(np.asarray(b.prim_id), np.asarray(b.t),
                      np.asarray(a.prim_id), np.asarray(a.t),
                      max_tie_frac=0.05)
