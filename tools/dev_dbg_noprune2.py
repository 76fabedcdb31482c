"""Diff full build_minitree vs build_minitree_fast in the no-pruning case."""
import numpy as np
import jax.numpy as jnp

from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree
from bvh_tpu.build.minitree_fast import build_minitree_fast
from bvh_tpu.core.types import Index

rng = np.random.default_rng(4)
n = 2000
c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
h = rng.uniform(0.01, 2.0, (n, 3))
mn = (c - h).astype(np.float32)
mx = (c + h).astype(np.float32)
cc = ((mn + mx) * 0.5).astype(np.float32)

cfg = MiniTreeConfig(enable_pruning=False)
ref = build_minitree(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc), cfg)
fast = build_minitree_fast(mn, mx, cc, cfg, interpret=True)

nc_r, nc_f = int(ref.node_count), int(fast.node_count)
print("node_count:", nc_r, nc_f)
print("prim_count:", int(ref.prim_count), int(fast.prim_count))
pr_r = np.asarray(ref.prim_ids)
pr_f = np.asarray(fast.prim_ids)
dp = np.nonzero(pr_r != pr_f)[0]
print("prim_ids mismatches:", len(dp), dp[:10], )
if len(dp):
    print("  ref:", pr_r[dp[:10]], " fast:", pr_f[dp[:10]])
nc = min(nc_r, nc_f)
b_r = np.asarray(ref.bounds)[:nc]
b_f = np.asarray(fast.bounds)[:nc]
db = np.nonzero((b_r != b_f).any(axis=1))[0]
print("bounds mismatch rows:", len(db), db[:10])
i_r = np.asarray(ref.index)[:nc]
i_f = np.asarray(fast.index)[:nc]
di = np.nonzero(i_r != i_f)[0]
print("index mismatch rows:", len(di), di[:10])
for r in di[:6]:
    print(f"  row {r}: ref leaf={bool(Index.is_leaf(i_r[r]))} "
          f"first={int(Index.first_id(i_r[r]))} cnt={int(Index.prim_count(i_r[r]))}"
          f" | fast leaf={bool(Index.is_leaf(i_f[r]))} "
          f"first={int(Index.first_id(i_f[r]))} cnt={int(Index.prim_count(i_f[r]))}")
