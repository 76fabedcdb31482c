"""Driver benchmark: sponza-class (262K-tri) primary-ray throughput on
one chip — BASELINE.md's primary metric configuration.

Scene: procedural sponza_class(262144, seed 0) (io/scenes.py), the
interior camera from scene_camera, 1024x1024 primary rays, BVH built at
quality=high (mini-tree + reinsertion, the reference default). The
traversal is the wide-treelet path (8-ary quad-leaf Pallas kernel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra metrics (shadow rays, build rates, oracle hit check) go to stderr.

Baseline: the C++ reference library compiled -O2 -march=native on this
machine traces the same rays through the same BVH at 6.1 Mrays/s single
threaded (tools/oracle_trace.cpp; PERFORMANCE.md).

Oracle: the C++ reference's closest-hit count for this exact
(scene, camera, BVH) configuration, regenerated with
tools/check_oracle.py; a mismatch marks the run invalid.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS_S = 9.5  # C++ reference (tools/oracle_trace.cpp, -O2
# -march=native, single thread) on this host: 9.2-9.9 Mrays/s on the
# exact same rays/BVH.
N_TRIS = 262_144
SIDE = 1024
# Fallback oracle hit count (used only when the C++ toolchain is not
# available to run the per-ray oracle; compared exactly). The per-ray
# oracle is the real check: tools/check_oracle.py semantics,
# 4-per-million boundary budget (TPU vs CPU FMA contraction flips
# Moller-Trumbore accepts within ~1 ulp of a triangle edge; every
# sampled case f64-classified). 81790 for the device-built high BVH
# (round 4: per-ray oracle shows 1048575/1048576 exact prim matches,
# 1 exact-t tie, zero real mismatches on this BVH).
ORACLE_HITS = 81790


def main():
    # The tunneled TPU occasionally drops a request mid-run
    # (UNAVAILABLE / FailedPrecondition); retry a few times so a
    # transient infra fault does not zero out the benchmark.
    last = None
    for attempt in range(3):
        try:
            return _run()
        except AssertionError:
            # deterministic oracle mismatch: fail fast, never retry
            raise
        except Exception as e:  # noqa: BLE001 - backend errors vary
            last = e
            print(f"# attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(20)
    raise last


def _scene_hash(tris):
    """Content hash of the scene so a stale /tmp cache from a different
    scene-generator version cannot silently survive."""
    import hashlib

    return hashlib.sha256(
        np.ascontiguousarray(tris, dtype=np.float32).tobytes()
    ).hexdigest()[:16]


def _build_bvh(tris):
    """Quality-high BVH built ON DEVICE — mini-tree-fast + reinsertion,
    the reference High pipeline (default_builder.h:33-46) — cached on
    disk keyed by scene content hash. The native C++ library is only a
    fallback (and the oracle binary traces whatever BVH this returns,
    so the per-ray gate is unaffected by the builder choice)."""
    cache = f"/tmp/bench_sponza_dev_{N_TRIS}_{_scene_hash(tris)}.bvh"
    if not os.path.exists(cache):
        try:
            import jax.numpy as jnp

            from bvh_tpu.build.minitree import MiniTreeConfig
            from bvh_tpu.build.minitree_fast import build_minitree_fast
            from bvh_tpu.build.reinsertion import optimize_reinsertion
            from bvh_tpu.io.serialize import save_bvh

            mn = jnp.asarray(tris.min(axis=1), jnp.float32)
            mx = jnp.asarray(tris.max(axis=1), jnp.float32)
            cc = jnp.asarray(tris.mean(axis=1), jnp.float32)
            t0 = time.perf_counter()
            bvh = build_minitree_fast(mn, mx, cc, MiniTreeConfig())
            bvh = optimize_reinsertion(bvh)
            float(bvh.bounds[0, 0])  # force
            print(f"# device high build (mtf + reinsertion): "
                  f"{time.perf_counter()-t0:.2f} s (incl. compile)",
                  file=sys.stderr)
            save_bvh(bvh, cache)
        except Exception as e:  # noqa: BLE001
            print(f"# device high build failed ({e}); "
                  f"falling back to the native library", file=sys.stderr)
            from bvh_tpu.api.native import NativeBvh3f, load_library

            nat = NativeBvh3f(load_library())
            h = nat.build(tris.min(axis=1), tris.max(axis=1),
                          tris.mean(axis=1), quality=2)
            nat.save(h, cache)
            nat.destroy(h)
    from bvh_tpu.io.serialize import load_bvh

    return load_bvh(cache), cache


def _source_hash(*paths):
    """Content hash of source files so a stale /tmp binary built from a
    different checkout cannot be silently trusted."""
    import hashlib

    h = hashlib.sha256()
    for p in paths:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _run_oracle(bvh_path, tris, rays):
    """Compile (if needed) and run the C++ reference oracle over the
    same (BVH, rays). Only this function is allowed to fail when the
    toolchain is absent; comparison bugs must propagate.

    Returns (ref_pos, ref_t) per ray."""
    import subprocess
    import tempfile

    R = len(np.asarray(rays.tmin))
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "tools", "oracle_trace.cpp")
    oracle = f"/tmp/oracle_trace_{_source_hash(src)}"
    try:
        if not os.path.exists(oracle):
            subprocess.run(
                ["g++", "-std=c++20", "-O2", "-march=native",
                 "-I/root/reference/src", "-I/root/reference/test",
                 src, "-o", oracle], check=True, cwd=here)
        tmpdir = tempfile.mkdtemp(prefix="bench_oracle_")
        tris_bin = os.path.join(tmpdir, "tris.bin")
        rays_bin = os.path.join(tmpdir, "rays.bin")
        out_bin = os.path.join(tmpdir, "out.bin")
        rays_packed = np.zeros((R, 8), np.float32)
        rays_packed[:, 0:3] = np.asarray(rays.org)
        rays_packed[:, 3:6] = np.asarray(rays.dir)
        rays_packed[:, 6] = np.asarray(rays.tmin)
        rays_packed[:, 7] = np.asarray(rays.tmax)
        tris.astype(np.float32).reshape(len(tris), 9).tofile(tris_bin)
        rays_packed.tofile(rays_bin)
        subprocess.run([oracle, bvh_path, tris_bin, rays_bin, out_bin],
                       check=True, stdout=subprocess.DEVNULL)
        raw = np.fromfile(out_bin, np.uint32).reshape(R, 4)
    except (FileNotFoundError, OSError, subprocess.CalledProcessError) as e:
        return None, e
    ref_pos = np.where(raw[:, 0] == 0xFFFFFFFF, -1,
                       raw[:, 0].astype(np.int64))
    ref_t = raw[:, 1:2].view(np.float32)[:, 0]
    return (ref_pos, ref_t), None


def _oracle_check(bvh_path, tris, rays, hit, n_hits):
    """Per-ray comparison against the C++ reference traced through the
    SAME BVH (tools/check_oracle.py semantics): exact prim match per
    ray, with the documented 4-per-million boundary budget for 1-ulp
    Moller-Trumbore edge flips (TPU vs CPU FMA contraction; every
    sampled case f64-classified — see PERFORMANCE.md). Falls back to an
    exact hit-count equality check only when the C++ toolchain itself
    is unavailable (compile/run failure); any error in the comparison
    code propagates."""
    R = len(np.asarray(rays.tmin))
    ref, err = _run_oracle(bvh_path, tris, rays)
    if ref is not None:
        ref_pos, ref_t = ref
        our_t = np.asarray(hit.t)
        our_pos = np.where(our_t < np.inf,
                           np.asarray(hit.prim_pos).astype(np.int64), -1)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.check_oracle import compare

        ok = compare("bench/wide_treelet", our_pos, our_t, ref_pos, ref_t)
    else:
        # toolchain absent: exact hit-count equality (ORACLE_HITS was
        # measured to match exactly). NOTE: a count check cannot detect
        # compensating flips (equal numbers of spurious + missing hits);
        # the per-ray oracle is the real gate.
        print(f"# per-ray oracle unavailable ({err}); "
              f"falling back to exact hit-count check "
              f"(cannot detect compensating flips)", file=sys.stderr)
        ok = n_hits == ORACLE_HITS
        print(f"# hit count {n_hits} vs oracle {ORACLE_HITS} (exact)",
              file=sys.stderr)
    print(f"# hits_match: {str(ok).lower()}", file=sys.stderr)
    if not ok:
        raise AssertionError("per-ray oracle mismatch beyond the "
                             "documented boundary budget")


def _run():
    import jax
    import jax.numpy as jnp

    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.core.ray import Ray
    from bvh_tpu.geom.tri import PrecomputedTri, Tri
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.traverse.wide_treelet import (
        build_wide_treelets,
        wide_treelet_intersect_tris,
    )

    R = SIDE * SIDE
    tris = sponza_class(N_TRIS, seed=0)
    bvh, bvh_path = _build_bvh(tris)
    tri = Tri(jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
              jnp.asarray(tris[:, 2]))
    flat = PrecomputedTri.from_tri(tri).as_flat()
    eye, d, up = scene_camera(tris)
    rays = primary_rays(eye, d, up, SIDE, SIDE)

    from bvh_tpu.traverse.wide_treelet import _lcm, _round_up

    tl = build_wide_treelets(bvh, flat)
    Rp = _round_up(R, _lcm(512, 8192))
    # One throughput knob (sel_cap, measured best for this class);
    # block/tail_block/portals_per_round come from wide_treelet_perf
    # and every CAPACITY from the library: scene-derived starting caps
    # + exact overflow flags on the verified call, then the measured
    # high-water marks (diag["caps_observed"]) for the steady-state
    # chain — the zero-knob contract (mini_tree_builder.h:47-58).
    kw = dict(sel_cap=Rp // 8)

    hit, diag = wide_treelet_intersect_tris(
        tl, rays, check_overflow=True, return_diag=True, **kw)
    n_hits = int(np.asarray(np.isfinite(hit.t)).sum())
    print(f"# {n_hits} intersections", file=sys.stderr)
    ls, vli, slots = (float(diag["lane_steps"]),
                      float(diag["valid_lane_iters"]),
                      max(1.0, float(diag["lane_slots"])))
    print(f"# occupancy {ls/slots:.3f} (run-padding "
          f"{1.0 - vli/slots:.3f}, drain {max(0.0, vli-ls)/slots:.3f}); "
          f"rounds {int(diag['rounds'])}, block_iters "
          f"{int(diag['block_iters'])}, lane_steps {int(ls)}; "
          f"caps_observed {diag['caps_observed']}", file=sys.stderr)
    kw.update(diag["caps_observed"])
    _oracle_check(bvh_path, tris, rays, hit, n_hits)

    # Steady-state timing: chained renders inside one jitted program,
    # measured at TWO chain lengths so the fixed per-dispatch tunnel
    # overhead (~126 ms measured round 5) cancels — the marginal
    # per-render time is the pure device rate (see cli/steady.py; the
    # result-scalar readback is the synchronization point because
    # block_until_ready does not block on this platform).
    from bvh_tpu.cli.steady import steady_rate
    from bvh_tpu.traverse.wide_treelet import wide_treelet_render_chain

    chains = {}

    def make_chain(k):
        chain = wide_treelet_render_chain(tl, rays, k, **kw)
        chains[k] = chain
        return lambda: float(chain()[0])

    r_s, c_s, t16, t64 = steady_rate(make_chain, 16, 64)
    # Chain-validity guard: the chain's FINAL render must reproduce
    # the verified call's hits exactly (the ray buffer is preserved
    # bit-identically through the feed-forward). A collapsed chain —
    # the NaN feed-forward bug this guard was written for — returns
    # all-inf and fails here instead of flattering the number.
    chain_hits = int(np.isfinite(np.asarray(chains[64]())[:R]).sum())
    assert chain_hits == n_hits, (
        f"chain output diverged: {chain_hits} hits vs verified {n_hits}"
        " — the chained renders are not executing the real workload")
    print(f"# chain output verified: {chain_hits} hits == verified run",
          file=sys.stderr)
    mrays = R / r_s / 1e6
    print(f"# steady {r_s*1e3:.2f} ms/render (dispatch overhead "
          f"{c_s*1e3:.0f} ms/call; raw chains: {t16*1e3/16:.2f} "
          f"ms/render @K=16, {t64*1e3/64:.2f} @K=64)", file=sys.stderr)

    # Secondary metrics (stderr) --------------------------------------
    try:
        light = jnp.asarray(eye, jnp.float32) + jnp.asarray(
            [0.0, 1.0, 0.0], jnp.float32)
        hitp = rays.org + rays.dir * jnp.where(
            jnp.isfinite(hit.t), hit.t, 0.0)[:, None]
        to_light = light[None, :] - hitp
        srays = Ray.make(hitp, to_light, tmin=1e-4,
                         tmax=jnp.ones_like(hit.t))
        # verified any-hit call: shadow rays have their own portal/stack
        # profile, so the chain gets ITS observed capacities
        _, sdiag = wide_treelet_intersect_tris(
            tl, srays, check_overflow=True, return_diag=True,
            any_hit=True, **dict(sel_cap=Rp // 8))
        skw = dict(kw, any_hit=True)
        skw.update(sdiag["caps_observed"])

        def make_schain(k):
            chain = wide_treelet_render_chain(tl, srays, k, **skw)
            return lambda: float(chain()[0])

        sr, sc, _, _ = steady_rate(make_schain, 16, 64)
        s_mrays = R / sr / 1e6
        print(f"# shadow rays (any-hit): {s_mrays:.2f} Mrays/s "
              f"({sr*1e3:.2f} ms/render steady)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# shadow metric skipped: {e}", file=sys.stderr)

    try:
        from bvh_tpu.build.lbvh import build_lbvh

        bb_min = jnp.asarray(tris.min(axis=1))
        bb_max = jnp.asarray(tris.max(axis=1))
        centers = jnp.asarray(tris.mean(axis=1))
        fn = jax.jit(build_lbvh)
        b = fn(bb_min, bb_max, centers)
        float(b.bounds[0, 0])
        t0 = time.perf_counter()
        b = fn(bb_min, bb_max, centers)
        float(b.bounds[0, 0])
        dt = time.perf_counter() - t0
        print(f"# build lbvh (TPU): {N_TRIS/dt/1e6:.3f} Mprims/s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# build metric skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "primary_rays_sponza_262k",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS_S, 3),
    }))


if __name__ == "__main__":
    main()
