"""San-Miguel-scale per-stage time attribution (round 4).

The sponza profiler (profile_r3.py) mirrors stages at 262K-tri shapes;
at 10M tris the shape regime is different (T in the thousands, P=1280,
padded kernel grids of min(T+2, max_runs) extra blocks) and the round-4
question is WHERE the ~500 ms render goes.  This tool measures, on the
real chip, each suspect in isolation plus the full render at varying
max_rounds (the slope is the true per-tail-round cost, the intercept
phase A + A2 + round 1):

  - phase A collect kernel at the scene's top-table width
  - padded-block overhead of the wide kernel: a _phase_b launch whose
    pairs are ALL invalid (erel=0) — pure per-grid-step cost, with
    distinct tids (every block DMAs a fresh [ROWS, P] table row) vs one
    tid (Pallas revisiting skips the copy)
  - the round glue sorts at SM widths (11-op expansion sort at L,
    capped 6-op unsort at 2L, compaction 2-op sort at Rc)
  - full render chained x4 at max_rounds in {1, M}

Run ALONE (single TPU process).
usage: python tools/profile_sm.py --tables /tmp/bench_tl_10000000_4096_auto.npz \
           [--k 4] [--tail-cap 0] [--max-runs 2048] [--rounds 1,9]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SYNC_MS = [35.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", required=True)
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--tail-block", type=int, default=256)
    ap.add_argument("--tail-cap", type=int, default=0)
    ap.add_argument("--max-runs", type=int, default=2048)
    ap.add_argument("--rc-div", type=int, default=8)
    ap.add_argument("--rounds", type=str, default="1,9",
                    help="comma list of max_rounds for the full render")
    ap.add_argument("--skip-render", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from bvh_tpu.cli.camera import primary_rays
    from bvh_tpu.io.scenes import scene_camera, sponza_class
    from bvh_tpu.traverse import wide_treelet as wt
    from bvh_tpu.traverse.collect import collect_kernel as _ck

    i32, f32 = jnp.int32, jnp.float32

    z = np.load(args.tables)
    tl = wt.WideTreelets(
        top_node_t=jnp.asarray(z["top_node_t"]), top_root=int(z["top_root"]),
        table=jnp.asarray(z["table"]), n_prims=int(z["n_prims"]),
        n_wide=z["n_wide"], top_depth=int(z["top_depth"]),
        wide_depth=int(z["wide_depth"]),
        sup_table=jnp.asarray(z["sup_table"]), sup_depth=int(z["sup_depth"]))
    import jax as _jax
    ktab = (_jax.jit(wt.pack_kernel_table)(
        tl.table, jnp.asarray(np.asarray(tl.n_wide), jnp.int32))
        if tl.table.shape[2] >= wt.PACK_MIN_P else tl.table)
    T, ROWS, P = tl.table.shape
    S = tl.sup_table.shape[0]
    K = args.k
    caps = wt.wide_treelet_caps(tl, K)
    caps["stack_depth"] = 7 * tl.wide_depth + 8
    MP = caps["max_portals"]
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    print(f"T={T} ROWS={ROWS} P={P} S={S} top={tl.top_node_t.shape[1]} "
          f"caps={caps}", flush=True)

    tris = sponza_class(args.n, seed=0)
    eye, d, up = scene_camera(tris)
    del tris
    rays = primary_rays(eye, d, up, args.rays, args.rays)
    R = args.rays * args.rays

    top_stack = tl.top_depth + 1
    tb_a, fetch_chunk = wt.phase_a_plan(
        tl.top_node_t.shape[1], 8192, top_stack=top_stack, max_portals=MP)
    Rp = wt._round_up(R, wt._lcm(args.block, tb_a))
    Rc = min(Rp // args.rc_div, Rp)
    Rc = wt._round_up(Rc, args.block)
    AC = args.tail_cap or min(
        max(args.tail_block, wt._round_up(Rc // 8, args.tail_block)), Rc)
    L1 = K * Rc
    Lt = K * AC
    NBL1 = -(-L1 // args.block) + min(T + 2, args.max_runs)
    NBLt = -(-Lt // args.tail_block) + min(T + 2, args.max_runs)
    print(f"Rp={Rp} Rc={Rc} AC={AC} L1={L1} Lt={Lt} NBL1={NBL1} "
          f"NBLt={NBLt} top_block={tb_a} fetch_chunk={fetch_chunk}",
          flush=True)

    packed = np.zeros((8, Rp), np.float32)
    packed[0:3, :R] = np.asarray(rays.org.T)
    packed[3:6, :R] = np.asarray(rays.dir.T)
    packed[6, :R] = np.asarray(rays.tmin)
    packed[7, :R] = np.asarray(rays.tmax)
    if Rp > R:
        packed[6, R:] = 1.0
        packed[3, R:] = 1.0
    packed = jnp.asarray(packed)

    def sync(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))
        return x

    def bench(name, fn, *a, n=3, per=4):
        sync(fn(*a))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[n // 2] * 1e3
        print(f"{name:52s} {t:8.1f} ms  (per op "
              f"{(t - SYNC_MS[0]) / per:8.2f})", flush=True)
        return (t - SYNC_MS[0]) / per

    @jax.jit
    def null(x):
        return x + 1.0

    sync(null(jnp.zeros(())))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(null(jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    SYNC_MS[0] = sorted(ts)[2] * 1e3
    print(f"sync floor: {SYNC_MS[0]:.1f} ms", flush=True)

    # ---- phase A ------------------------------------------------------
    tnt = tl.top_node_t
    if fetch_chunk and tnt.shape[1] % fetch_chunk:
        tnt = jnp.pad(tnt, ((0, 0), (0, -tnt.shape[1] % fetch_chunk)))

    def phase_a_only(top_node_t, pk):
        root = jnp.full((8, 128), tl.top_root, i32)
        grid_spec = pl.GridSpec(
            grid=(Rp // tb_a,),
            in_specs=[
                pl.BlockSpec(top_node_t.shape, lambda i: (0, 0)),
                pl.BlockSpec((8, tb_a), lambda i: (0, i)),
                pl.BlockSpec((8, 128), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((MP, tb_a), lambda i: (0, i)),
                pl.BlockSpec((MP, tb_a), lambda i: (0, i)),
                pl.BlockSpec((8, tb_a), lambda i: (0, i)),
            ],
        )
        kernel = partial(_ck, dim=3, robust=False, stack_depth=top_stack,
                         max_portals=MP, fetch_chunk=fetch_chunk)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((MP, Rp), i32),
                       jax.ShapeDtypeStruct((MP, Rp), f32),
                       jax.ShapeDtypeStruct((8, Rp), i32)])(
            top_node_t, pk, root)

    @jax.jit
    def phase_a_x4(top_node_t, pk):
        def body(i, c):
            out = phase_a_only(top_node_t, c)
            return c - jnp.nan_to_num(out[1][0, 0] * 0.0)

        return jax.lax.fori_loop(0, 4, body, pk)

    pa = bench("phase A kernel", phase_a_x4, tnt, packed)
    ptid0, ptent0, cnt = jax.jit(phase_a_only)(tnt, packed)
    cnt_np = np.asarray(cnt[0])
    nready = int((cnt_np > 0).sum())
    print(f"  rays with portals: {nready} max {cnt_np.max()} "
          f"total pairs {cnt_np.sum()}", flush=True)

    # ---- padded-block overhead of the wide kernel ---------------------
    def empty_phase_b(btid, data, table, blk):
        nbl = btid.shape[0]
        bstart = jnp.zeros((nbl,), i32)
        berel = jnp.zeros((nbl,), i32)
        return wt._phase_b(btid, bstart, berel, table, data,
                           block=blk, any_hit=False, robust=False,
                           stack_depth=caps["stack_depth"],
                           interpret=False)

    for blk, nbl, tag in ((args.tail_block, NBLt, "tail"),
                          (args.block, NBL1, "round1")):
        data0 = jnp.zeros((16, nbl * 0 + blk + 128 + blk), f32)
        # data only needs blk+128 cols beyond start 0; give it 2*blk+128
        btid_same = jnp.zeros((nbl,), i32)
        btid_dist = (jnp.arange(nbl, dtype=i32) * 131) % T

        # NB: the treelet table must be a jit ARGUMENT — closed over, it
        # is embedded as an HLO literal (1.1 GB at SM scale) and the
        # tunneled compile request dies with HTTP 413.
        @jax.jit
        def x4(btid, data, table):
            def body(i, c):
                out = empty_phase_b(btid, data, table, blk)
                return c - jnp.nan_to_num(out[0, 0] * 0.0)

            return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

        try:
            t_same = bench(f"empty kernel {tag}: {nbl} blocks, 1 tid",
                           x4, btid_same, data0, ktab)
            t_dist = bench(
                f"empty kernel {tag}: {nbl} blocks, distinct tids",
                x4, btid_dist, data0, ktab)
            print(f"  per-block overhead ({tag}): same-tid "
                  f"{t_same / nbl * 1e3:.2f} us, distinct "
                  f"{t_dist / nbl * 1e3:.2f} us", flush=True)
        except Exception as e:  # stage is diagnostic-only; keep going
            print(f"  empty-kernel stage ({tag}) failed: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # ---- round glue sorts at SM widths ---------------------------------
    rng = np.random.default_rng(0)

    for L, tag in ((L1, "round1"), (Lt, "tail")):
        keyL = jnp.asarray(rng.integers(0, T * 8, L).astype(np.int32))
        rows10 = jnp.asarray(rng.random((10, L), np.float32))

        @jax.jit
        def sort11(keyL_, rows_):
            def body(i, c):
                ops = (c,) + tuple(rows_[j] for j in range(10))
                s = jax.lax.sort(ops, num_keys=1)
                return c - s[1][0].astype(i32) * 0  # int feed: no inf/NaN risk

            return jax.lax.fori_loop(0, 4, body, keyL_)

        bench(f"11-op expansion sort [{L}] ({tag})", sort11, keyL, rows10)

        key2 = jnp.asarray(rng.random(2 * L, np.float32))
        rows5 = jnp.asarray(rng.random((5, 2 * L), np.float32))

        @jax.jit
        def unsort6(key_, rows_):
            def body(i, c):
                ops = (c,) + tuple(rows_[j] for j in range(5))
                s = jax.lax.sort(ops, num_keys=1)
                return c - jnp.nan_to_num(s[1][0] * 0.0)

            return jax.lax.fori_loop(0, 4, body, key_)

        bench(f"capped 6-op unsort [{2*L}] ({tag})", unsort6, key2, rows5)

    keyc = jnp.asarray(rng.integers(0, 2, Rc).astype(np.int32))
    iota_c = jnp.arange(Rc, dtype=i32)

    @jax.jit
    def compact2(key_):
        def body(i, c):
            s = jax.lax.sort((c, iota_c), num_keys=1)
            return c - jnp.nan_to_num(s[1] * 0.0)

        return jax.lax.fori_loop(0, 4, body, keyc)

    bench(f"compaction 2-op sort [{Rc}]", compact2, keyc)

    # gathers of one tail round: S6(6) + portals(2*MP) + rays(7) at AC
    S6 = jnp.asarray(rng.random((6, Rc), np.float32))
    pt = jnp.asarray(rng.integers(0, T, (MP, Rc)).astype(np.int32))
    selc = jnp.asarray(rng.integers(0, Rc, AC).astype(np.int32))

    @jax.jit
    def gathers(S6_, pt_):
        def body(i, c):
            a = jnp.take(S6_, selc, axis=1)
            b = jnp.take(pt_, selc, axis=1)
            return c + a[0, 0] + jnp.nan_to_num(b[0, 0].astype(f32) * 0.0)

        return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

    bench(f"outer-round gathers [6+{MP} rows, {AC} of {Rc}]",
          gathers, S6, pt)

    if args.skip_render:
        return

    # ---- full render at varying max_rounds ----------------------------
    for M in [int(x) for x in args.rounds.split(",")]:
        inner = partial(
            wt._render_jit, top_root=tl.top_root, any_hit=False,
            robust=False, block=args.block, tail_block=args.tail_block,
            top_block=tb_a, top_stack=top_stack,
            stack_depth=caps["stack_depth"], max_portals=MP,
            max_rounds=M, sel_cap=Rc, portals_per_round=K,
            interpret=False, sup_stack=tl.sup_depth + 1,
            max_new=caps["max_new"], k2=2, mps=caps["mps"], a2_cap=None,
            max_runs=args.max_runs, tail_cap=AC, fetch_chunk=fetch_chunk)

        @jax.jit
        def run(top_node_t, table, sup_table, pk):
            def body(i, c):
                bt = inner(top_node_t, table, c, sup_table)[0]
                return c - jnp.nan_to_num(bt[0] * 0.0)

            out = jax.lax.fori_loop(0, 3, body, pk)
            r = inner(top_node_t, table, out, sup_table)
            return r[0], r[5], r[6], r[7]

        t0 = time.perf_counter()
        out = run(tl.top_node_t, ktab, tl.sup_table, packed)
        sync(out)
        print(f"render max_rounds={M}: compile+run "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(tl.top_node_t, ktab, tl.sup_table, packed)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1] * 1e3
        per = (t - SYNC_MS[0]) / 4
        print(f"render max_rounds={M}: {per:8.1f} ms/render  "
              f"rounds={int(out[1])} iters={int(out[2])} "
              f"lane_steps={int(out[3])}", flush=True)


if __name__ == "__main__":
    main()
