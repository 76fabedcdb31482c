import os
import numpy as np
from bvh_tpu.build.binned import build_binned
from bvh_tpu.io.serialize import load_bvh
from test_traverse import primary_rays, INVALID
from helpers import scene_arrays
from bvh_tpu.traverse.wavefront import intersect_tris

def test_dbg2(golden_dir, cornell_tris, golden_hits):
    mn, mx, centers, flat = scene_arrays(cornell_tris)
    bvh = build_binned(mn, mx, centers)
    rays = primary_rays()
    hit = intersect_tris(bvh, flat, rays, robust=True, permuted=False)
    got_prim = np.asarray(hit.prim_id)
    gbvh = load_bvh(os.path.join(golden_dir, "cornell_sweep.bvh"))
    perm = np.asarray(gbvh.prim_ids)
    want = np.where(golden_hits["prim_id"] != 0xFFFFFFFF,
                    perm[np.minimum(golden_hits["prim_id"], len(perm)-1)],
                    0xFFFFFFFF).astype(np.uint32)
    mask = want != 0xFFFFFFFF
    diff = mask & (got_prim != want)
    print("prim mismatches:", diff.sum(), "of", mask.sum())
    tt = np.asarray(hit.t)
    terr = np.abs(tt[diff] - golden_hits["t"][diff])
    if diff.sum():
        print("max t err at mismatches:", terr.max())
        pairs = set(zip(got_prim[diff].tolist(), want[diff].tolist()))
        print("distinct (got,want) pairs:", sorted(pairs)[:20])
