"""Count block-shared traversal steps (union walk) per 1024-ray block in numpy."""
import numpy as np
import sys
sys.path.insert(0, '/root/repo')
from scripts.bench_bvh import spherified_cube, make_rays
from mitsuba_tpu import native as native_mod

v0, e1, e2 = spherified_cube(130)
tris9 = np.concatenate([v0, e1, e2], axis=-1)
max_leaf = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=max_leaf)
lo, hi = nodes[:, 0:3], nodes[:, 3:6]
skip = nodes[:, 6].view(np.int32)
payload = nodes[:, 7].view(np.int32)
print(f"nodes={nodes.shape[0]}")

N = 1 << 14
for mode in ("fullcoh", "tiled", "incoherent"):
    o, d = make_rays(N, mode)
    if mode in ("tiled", "fullcoh"):
        import numpy as _np
        # reorder scanline rays of the 1024-wide grid into 32x32 tiles
        o2, d2 = make_rays(1 << 20, "coherent")
        idx = _np.arange(1 << 20)
        x = idx % 1024; y = idx // 1024
        tile = (y // 32) * 32 + (x // 32)
        within = (y % 32) * 32 + (x % 32)
        order2 = _np.argsort(tile * 1024 + within)
        if mode == "tiled":
            o, d = o2[order2], d2[order2]
        else:
            o, d = o2, d2
    N_eff = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    steps_tot = leaf_tot = group_tot = 0
    n_blocks = N_eff // 1024
    for b in range(n_blocks):
        sl = slice(b * 1024, (b + 1) * 1024)
        ob, ib = o[sl], inv[sl]
        best = np.full(1024, np.inf, np.float32)
        node = 0
        while node >= 0:
            steps_tot += 1
            t0 = (lo[node] - ob) * ib
            t1 = (hi[node] - ob) * ib
            tmin = np.minimum(t0, t1).max(-1)
            tmax = np.maximum(t0, t1).min(-1)
            hit = (tmax >= np.maximum(tmin, 0)) & (tmin < best)
            any_hit = hit.any()
            is_leaf = payload[node] != 0
            if any_hit and is_leaf:
                leaf_tot += 1
                cnt = payload[node] & 0xFF
                group_tot += (cnt + 7) // 8
            node = node + 1 if (any_hit and not is_leaf) else skip[node]
        # note: best never updated (upper bound on union size)
    print(f"{mode}: steps/block={steps_tot/n_blocks:.0f} leaves/block={leaf_tot/n_blocks:.0f} groups/block={group_tot/n_blocks:.0f}")
