"""Find which groups' node counts differ (no-pruning parity debug)."""
import numpy as np
import jax
import jax.numpy as jnp

from bvh_tpu.build.minitree import MiniTreeConfig, build_minitree, _grid_groups
from bvh_tpu.build.minitree_fast import build_minitree_fast, _host_groups
from bvh_tpu.build.group_kernel import group_forest_build
from bvh_tpu.build import frontier
from bvh_tpu.build.binned import _round as binned_round
from bvh_tpu.build.sah import TopDownConfig
from bvh_tpu.core.types import Index

rng = np.random.default_rng(4)
n = 2000
c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
h = rng.uniform(0.01, 2.0, (n, 3))
mn = (c - h).astype(np.float32)
mx = (c + h).astype(np.float32)
cc = ((mn + mx) * 0.5).astype(np.float32)

cfg = MiniTreeConfig(enable_pruning=False)

# ---- reference forest ----
bb_min, bb_max, centers = jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(cc)
dim = 3
g_cap = min(1 << (cfg.log2_grid_dim * dim), n)
group, _ = _grid_groups(centers, cfg)
group = jnp.minimum(group, g_cap - 1)
prim_ids = jnp.arange(n, dtype=jnp.int32)
group_s, order = jax.lax.sort((group, prim_ids), num_keys=2)
counts = jnp.zeros((g_cap,), jnp.int32).at[group].add(1)
begins = jnp.cumsum(counts, dtype=jnp.int32) - counts
ends = begins + counts
forest_cap = 2 * n + g_cap
forest = frontier.init_forest(bb_min, bb_max, order, begins, ends,
                              cfg.min_leaf_size, forest_cap)
tdc = TopDownConfig(sah=cfg.sah, min_leaf_size=cfg.min_leaf_size,
                    max_leaf_size=cfg.max_leaf_size)
forest = jax.lax.while_loop(
    lambda s: jnp.any(s.open_),
    lambda s: binned_round(s, bb_min, bb_max, centers, tdc), forest)

# per-tree node counts in the reference forest: root + descendants.
ids_f = np.arange(forest_cap)
valid_f = ids_f < int(forest.node_count)
first_f = np.asarray(Index.first_id(forest.index)).astype(np.int64)
leaf_f = np.asarray(Index.is_leaf(forest.index))
inner_f = ~leaf_f & valid_f
# tid propagation (host)
parent = np.full(forest_cap, -1, np.int64)
lch = np.where(inner_f, first_f, -1)
for i in np.nonzero(inner_f)[0]:
    parent[lch[i]] = i
    parent[lch[i] + 1] = i
tid = np.full(forest_cap, -1, np.int64)
tid[:g_cap] = np.arange(g_cap)
changed = True
while changed:
    changed = False
    for i in np.nonzero(valid_f & (tid < 0))[0]:
        if parent[i] >= 0 and tid[parent[i]] >= 0:
            tid[i] = tid[parent[i]]
            changed = True
ref_cnt = np.bincount(tid[valid_f & (tid >= 0)], minlength=g_cap)

# ---- fast kernel ----
group_np, g_cap2 = _host_groups(cc, cfg)
assert g_cap2 == g_cap
assert np.array_equal(group_np, np.asarray(group)), "grouping differs!"
order_np = np.lexsort((np.arange(n), group_np))
gs = group_np[order_np]
counts_all = np.bincount(group_np, minlength=g_cap).astype(np.int32)
tids = np.nonzero(counts_all > 0)[0].astype(np.int32)
G = len(tids)
kcounts = counts_all[tids]
P = int(max(128, ((kcounts.max() + 127) // 128) * 128))
NCAP = 2 * P
dense_of = np.full(g_cap, -1, np.int64)
dense_of[tids] = np.arange(G)
base = np.concatenate([[0], np.cumsum(kcounts)]).astype(np.int64)
dst = (np.arange(n) - base[dense_of[gs]]) + dense_of[gs] * P
pf = np.zeros((16, G * P), np.float32)
pf[0:dim, dst] = cc[order_np].T
pf[dim:2 * dim, dst] = mn[order_np].T
pf[2 * dim:3 * dim, dst] = mx[order_np].T
nbf, nbi, src, kcnt = group_forest_build(
    jnp.asarray(pf), jnp.asarray(kcounts), dim=dim, P=P, NCAP=NCAP,
    min_leaf=cfg.min_leaf_size, max_leaf=cfg.max_leaf_size,
    log_cluster=cfg.sah.log_cluster_size, cost_ratio=cfg.sah.cost_ratio,
    interpret=True)
kcnt = np.asarray(kcnt)

print("G =", G, "P =", P)
print("ref total nodes:", ref_cnt[tids].sum(), " kernel total:", kcnt.sum())
bad = np.nonzero(ref_cnt[tids] != kcnt)[0]
print("groups differing:", len(bad))
for b in bad[:10]:
    print(f"  dense {b} tid {tids[b]} size {kcounts[b]} "
          f"ref_nodes {ref_cnt[tids[b]]} kernel_nodes {kcnt[b]}")
