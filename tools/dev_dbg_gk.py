"""Find the first diverging node between group kernel and build_binned."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from bvh_tpu.build.binned import build_binned
from bvh_tpu.build.group_kernel import group_forest_build

n, P, seed = 100, 128, 1
rng = np.random.default_rng(seed)
c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
h = rng.uniform(0.01, 2.0, (n, 3))
mn = (c - h).astype(np.float32)
mx = (c + h).astype(np.float32)
cc = ((mn + mx) * 0.5).astype(np.float32)

ref = build_binned(jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc))
nc_ref = int(ref.node_count)

pf = np.zeros((16, P), np.float32)
pf[0:3, :n] = cc.T
pf[3:6, :n] = mn.T
pf[6:9, :n] = mx.T
nbf, nbi, src, cnt = group_forest_build(
    jnp.asarray(pf), jnp.asarray([n]), dim=3, P=P, interpret=True)
nbf, nbi, src, cnt = map(np.asarray, (nbf, nbi, src, cnt))
nc = int(cnt[0])
print("node counts:", nc, nc_ref)

order_ref = np.asarray(ref.prim_ids).astype(np.int64)
order_k = src[:n]
bad = np.nonzero(order_k != order_ref)[0]
print("order mismatches at positions:", bad, "ours:", order_k[bad],
      "ref:", order_ref[bad])

idx_ref = np.asarray(ref.index)[:nc_ref]
first = (idx_ref >> 4).astype(np.int64)
pcount = (idx_ref & 15).astype(np.int64)
bounds_ref = np.asarray(ref.bounds)[:nc_ref]

begin = nbi[0, :nc]
end = nbi[1, :nc]
child = nbi[2, :nc]
bounds_k = nbf[0:6, :nc].T

# reconstruct ref begin/end for leaves; compare bounds per node slot
nb_bad = np.nonzero(~np.all(bounds_k == bounds_ref, axis=1))[0]
print("bounds mismatch node slots:", nb_bad[:10])
for s in nb_bad[:6]:
    print(f"  slot {s}: ours b/e/child = {begin[s]}/{end[s]}/{child[s]}, "
          f"ref idx first/count = {first[s]}/{pcount[s]}")
    print(f"    ours bounds {bounds_k[s]}")
    print(f"    ref  bounds {bounds_ref[s]}")

# which leaf contains the bad position in each?
for p in bad:
    leaf_k = np.nonzero((child < 0) & (begin <= p) & (p < end))[0]
    leaf_r = np.nonzero((pcount > 0) & (first <= p) & (p < first + pcount))[0]
    print(f"pos {p}: our leaf slot {leaf_k} [{begin[leaf_k]},{end[leaf_k]}), "
          f"ref leaf slot {leaf_r} [{first[leaf_r]},{first[leaf_r]+pcount[leaf_r]})")

# find parent of slot 192
par = np.nonzero((child == 192) | (child == 191))[0]
print("parent candidates:", par, "child:", child[par], "b/e:",
      begin[par], end[par])
for s in par:
    print(f"  parent slot {s}: [{begin[s]},{end[s]}) child={child[s]}")
    print(f"  sibling slots {child[s]},{child[s]+1}: "
          f"[{begin[child[s]]},{end[child[s]]}) / "
          f"[{begin[child[s]+1]},{end[child[s]+1]})")
    print(f"  ref idx at {s}: first={first[s]} count={pcount[s]}")
