"""Wide-treelet traversal vs the XLA wavefront oracle.

Validates the round-2 large-scene path (traverse/wide_treelet.py):
preprocessing invariants, then hit-for-hit agreement with
`intersect_tris` on a multi-treelet procedural scene, in Pallas
interpret mode on the CPU mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu.api.flat import BuildConfig, bvh3f
from bvh_tpu.build.default import Quality
from bvh_tpu.cli.camera import primary_rays
from bvh_tpu.core.ray import Ray
from bvh_tpu.geom.tri import PrecomputedTri, Tri
from bvh_tpu.io.scenes import scene_camera, sponza_class
from bvh_tpu.traverse.wavefront import intersect_tris
from bvh_tpu.traverse.wide_treelet import (
    build_wide_treelets,
    wide_treelet_intersect_tris,
)


@pytest.fixture(scope="module")
def scene():
    tris = sponza_class(3000, seed=3)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    mn, mx = tri.get_bbox()
    bvh = bvh3f.build(mn, mx, tri.get_center(),
                      BuildConfig(quality=Quality.MEDIUM))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, 32, 32)
    return bvh, flat, rays


def _hits_match(a, b, n_rays, tie_budget=0.002):
    """Hit-for-hit comparison with a small coplanar-tie budget (the
    8-way sorting network is not stable; see module docstring)."""
    at = np.asarray(a.t)
    bt = np.asarray(b.t)
    ah = np.isfinite(at)
    bh = np.isfinite(bt)
    assert np.array_equal(ah, bh), (
        f"hit masks differ: {int((ah != bh).sum())} rays"
    )
    assert np.allclose(at[ah], bt[bh], rtol=1e-6, atol=1e-6)
    ap = np.asarray(a.prim_id)
    bp = np.asarray(b.prim_id)
    mism = int((ap != bp).sum())
    assert mism <= max(1, int(tie_budget * n_rays)), (
        f"{mism} prim-id mismatches"
    )


def test_preprocess_invariants(scene):
    bvh, flat, _ = scene
    tl = build_wide_treelets(bvh, flat, max_prims=256)
    T, rows, P = tl.table.shape
    assert rows == 64
    assert T >= 2, "scene should decompose into multiple treelets"
    assert P % 128 == 0
    # every valid quad gpos is a unique in-range prim position, and
    # the union over treelets covers every primitive exactly once
    tab = np.asarray(tl.table)
    gpos = []
    for t in range(T):
        wn = int(tl.n_wide[t])
        for j in range(4):
            gpos.append(tab[t, j * 13 + 12, wn:].ravel())
    gpos = np.concatenate(gpos)
    got = np.sort(gpos[gpos >= 0].astype(np.int64))
    assert np.array_equal(got, np.arange(tl.n_prims)), (
        "quad columns must cover every prim position exactly once"
    )


@pytest.mark.parametrize("any_hit", [False, True])
def test_matches_wavefront(scene, any_hit):
    bvh, flat, rays = scene
    oracle = intersect_tris(bvh, flat, rays, permuted=False,
                            any_hit=any_hit)
    tl = build_wide_treelets(bvh, flat, max_prims=256)
    hit = wide_treelet_intersect_tris(
        tl, rays, prim_ids=bvh.prim_ids, any_hit=any_hit,
        block=256, top_block=512, interpret=True,
    )
    n = rays.tmin.shape[0]
    if any_hit:
        ah = np.isfinite(np.asarray(hit.t))
        bh = np.isfinite(np.asarray(oracle.t))
        assert np.array_equal(ah, bh)
    else:
        _hits_match(hit, oracle, n)


@pytest.mark.slow
def test_single_treelet_scene(scene):
    """A scene small enough that the whole tree is one treelet
    (degenerate top region)."""
    bvh, flat, rays = scene
    tl = build_wide_treelets(bvh, flat, max_prims=1 << 14)
    assert tl.table.shape[0] == 1
    oracle = intersect_tris(bvh, flat, rays, permuted=False)
    hit = wide_treelet_intersect_tris(
        tl, rays, prim_ids=bvh.prim_ids,
        block=256, top_block=512, interpret=True,
    )
    _hits_match(hit, oracle, rays.tmin.shape[0])


@pytest.mark.slow
def test_robust_variant(scene):
    bvh, flat, rays = scene
    oracle = intersect_tris(bvh, flat, rays, permuted=False, robust=True)
    tl = build_wide_treelets(bvh, flat, max_prims=256)
    hit = wide_treelet_intersect_tris(
        tl, rays, prim_ids=bvh.prim_ids, robust=True,
        block=256, top_block=512, interpret=True,
    )
    _hits_match(hit, oracle, rays.tmin.shape[0])


@pytest.mark.slow
def test_matches_wavefront_50k():
    """Mid-scale parity (VERDICT: the no-fast-path gap between the
    2K-node mega-kernel and treelet scale): 50K tris, the range the
    CLI now auto-routes to the wide-treelet path on accelerators."""
    import jax.numpy as jnp
    from bvh_tpu.api.flat import BuildConfig, bvh3f
    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.geom.tri import PrecomputedTri, Tri

    tris = sponza_class(50_000, seed=7)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    mn, mx = tri.get_bbox()
    bvh = bvh3f.build(mn, mx, tri.get_center(), BuildConfig())
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, 16, 16)

    oracle = intersect_tris(bvh, flat, rays, permuted=False)
    tl = build_wide_treelets(bvh, flat, max_prims=1024)
    hit = wide_treelet_intersect_tris(
        tl, rays, prim_ids=bvh.prim_ids,
        block=256, top_block=256, interpret=True,
    )
    _hits_match(hit, oracle, rays.tmin.shape[0])


@pytest.mark.slow
def test_two_level_supers_match_flat(scene):
    """The San-Miguel-scale super level (phase A1/A2) returns exactly
    the flat scheme's hits: the super cut only changes how treelet
    portals are discovered, never which treelets a ray enters."""
    bvh, flat, rays = scene
    tl_flat = build_wide_treelets(bvh, flat, max_prims=128)
    tl_sup = build_wide_treelets(bvh, flat, max_prims=128,
                                 super_prims=512)
    assert tl_sup.sup_table.shape[0] > 0, "super level must engage"
    assert tl_sup.table.shape[0] == tl_flat.table.shape[0]
    kw = dict(prim_ids=bvh.prim_ids, block=256, top_block=256,
              max_portals=64, interpret=True)
    a = wide_treelet_intersect_tris(tl_flat, rays, **kw)
    b = wide_treelet_intersect_tris(tl_sup, rays, mps=32, **kw)
    n = rays.tmin.shape[0]
    _hits_match(a, b, n)
    # any-hit through the super level
    aa = wide_treelet_intersect_tris(tl_flat, rays, any_hit=True, **kw)
    bb = wide_treelet_intersect_tris(tl_sup, rays, any_hit=True,
                                     mps=32, **kw)
    assert np.array_equal(np.isfinite(np.asarray(aa.t)),
                          np.isfinite(np.asarray(bb.t)))


@pytest.mark.slow
def test_capped_runs_replay_matches(scene):
    """max_runs smaller than the treelet count forces the capped
    schedule: spilled pairs replay in later rounds and the result is
    still exact."""
    bvh, flat, rays = scene
    tl = build_wide_treelets(bvh, flat, max_prims=128)
    assert tl.table.shape[0] > 6
    kw = dict(prim_ids=bvh.prim_ids, block=256, top_block=256,
              max_portals=64, interpret=True)
    a = wide_treelet_intersect_tris(tl, rays, **kw)
    b = wide_treelet_intersect_tris(tl, rays, max_runs=8,
                                    max_rounds=512, **kw)
    _hits_match(a, b, rays.tmin.shape[0])


def test_render_chain_survives_missing_ray0(scene):
    """REGRESSION (round-5 retraction): the chain's feed-forward must
    not poison the ray buffer when ray 0 misses. The old
    `c + bt[0] * 0` feed turned bt[0] = +inf into NaN and silently
    collapsed renders 2..k to empty shells — every chained throughput
    number of rounds 2-4 measured that. The chain's final render must
    reproduce the direct call bit-for-bit."""
    bvh, flat, rays = scene
    import jax.numpy as jnp

    # force ray 0 to miss: point it away from the scene
    org = jnp.asarray(rays.org).at[0].set(jnp.asarray([1e6, 1e6, 1e6]))
    d = jnp.asarray(rays.dir).at[0].set(jnp.asarray([0.0, 0.0, 1.0]))
    r2 = Ray.make(org, d, tmin=rays.tmin, tmax=rays.tmax)
    tl = build_wide_treelets(bvh, flat, max_prims=256)
    kw = dict(block=256, top_block=512, interpret=True)
    direct = wide_treelet_intersect_tris(
        tl, r2, prim_ids=bvh.prim_ids, **kw)
    assert not np.isfinite(np.asarray(direct.t)[0]), "ray 0 must miss"
    from bvh_tpu.traverse.wide_treelet import wide_treelet_render_chain

    chain = wide_treelet_render_chain(tl, r2, 3, **kw)
    bt = np.asarray(chain())[: r2.tmin.shape[0]]
    dt_ = np.asarray(direct.t)
    dt_cmp = np.where(np.isfinite(dt_), dt_, np.inf)
    bt_cmp = np.where(np.isfinite(bt), bt, np.inf)
    assert np.array_equal(dt_cmp, bt_cmp), (
        f"chained render diverged: {np.isfinite(bt).sum()} hits vs "
        f"{np.isfinite(dt_).sum()} direct"
    )


def test_tail_k_window_matches(scene):
    """Tail rounds draining a WIDER portal window (tail_k) must give
    the same hits: windows are validity-masked and the merge is
    idempotent, so only the round structure changes."""
    bvh, flat, rays = scene
    tl = build_wide_treelets(bvh, flat, max_prims=128)
    kw = dict(prim_ids=bvh.prim_ids, block=256, top_block=256,
              max_portals=64, interpret=True)
    a = wide_treelet_intersect_tris(tl, rays, **kw)
    b = wide_treelet_intersect_tris(tl, rays, tail_k=12, **kw)
    _hits_match(a, b, rays.tmin.shape[0])


def test_chunked_phase_a_fetch_bit_identical(scene, monkeypatch):
    """The San-Miguel-scale chunked one-hot fetch (phase_a_plan picking
    a fetch_chunk smaller than the top table) must be bit-identical to
    the single-shot fetch: the one-hot dot sums exact zeros either way."""
    import bvh_tpu.traverse.wide_treelet as wt

    bvh, flat, rays = scene
    tl = build_wide_treelets(bvh, flat, max_prims=64)
    assert tl.top_node_t.shape[1] > 16, "need a multi-column top table"
    kw = dict(prim_ids=bvh.prim_ids, block=256, top_block=256,
              sel_cap=1024, interpret=True)
    base = wide_treelet_intersect_tris(tl, rays, **kw)
    monkeypatch.setattr(wt, "phase_a_plan",
                        lambda cols, tb, **k: (tb, 8))
    chunked = wide_treelet_intersect_tris(tl, rays, **kw)
    t1, t2 = np.asarray(base.t), np.asarray(chunked.t)
    assert ((t1 == t2) | (np.isinf(t1) & np.isinf(t2))).all()
    assert np.array_equal(np.asarray(base.prim_id),
                          np.asarray(chunked.prim_id))


def test_phase_a_plan_budget():
    """phase_a_plan keeps the one-hot intermediate inside the VMEM
    budget for San-Miguel-scale top tables instead of letting the
    Mosaic compile fail (round-2 failure mode)."""
    from bvh_tpu.traverse.wide_treelet import phase_a_plan

    # sponza at OBSERVED caps (top_stack ~8-16, MP 16-32) stays 8192
    tb, chunk = phase_a_plan(384, 8192, top_stack=16, max_portals=32)
    assert (tb, chunk) == (8192, None), "sponza observed config untouched"
    # the measured-OOM configs must re-tier below 8192 (the r5 shift
    # stack raised the per-ray footprint: 16.23 MB measured at
    # MP=32, top_stack=48 — the model must now reject it)
    tb, chunk = phase_a_plan(128, 8192, max_portals=64)
    assert tb < 8192
    tb48, _ = phase_a_plan(384, 8192, top_stack=48, max_portals=32)
    assert tb48 < 8192
    assert (7 * 64 + 4 * 48 + 84) * tb + 16 * 128 <= 15 * 1024 * 1024 // 4
    # very large top tables stream the one-hot fetch
    tb, chunk = phase_a_plan(16384, 8192)
    assert chunk is not None and chunk % 128 == 0
