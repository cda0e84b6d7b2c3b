"""Quantify the win of per-ROW (128-lane) hit masks over whole-block (1024)
union traversal: for each visited leaf, how many of the block's 8 rows
actually need its sweep?  Also adds the 'sorted incoherent' mode (what the
renderer actually feeds the kernel for bounce/shadow rays)."""
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from bench_bvh import spherified_cube, make_rays, sort_rays
from mitsuba_tpu import native as native_mod

v0, e1, e2 = spherified_cube(130)
tris9 = np.concatenate([v0, e1, e2], axis=-1)
max_leaf = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=max_leaf)
lo, hi = nodes[:, 0:3], nodes[:, 3:6]
skip = nodes[:, 6].view(np.int32)
payload = nodes[:, 7].view(np.int32)
print(f"nodes={nodes.shape[0]} max_leaf={max_leaf}")

N = 1 << 15
for mode in ("tiled", "sorted", "incoherent"):
    if mode == "tiled":
        o2, d2 = make_rays(1 << 20, "coherent")
        idx = np.arange(1 << 20)
        x = idx % 1024
        y = idx // 1024
        t_ = (y // 32) * 32 + (x // 32)
        w_ = (y % 32) * 32 + (x % 32)
        order2 = np.argsort(t_ * 1024 + w_)
        o, d = o2[order2][:N], d2[order2][:N]
    else:
        o, d = make_rays(N, "incoherent")
        if mode == "sorted":
            o, d = sort_rays(o, d, np.float32([-2, -2, -2]), np.float32([2, 2, 2]))
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    n_blocks = N // 1024
    steps = leaves = row_sweeps = 0
    for b in range(n_blocks):
        sl = slice(b * 1024, (b + 1) * 1024)
        ob = o[sl].reshape(8, 128, 3)
        ib = inv[sl].reshape(8, 128, 3)
        node = 0
        while node >= 0:
            steps += 1
            t0 = (lo[node] - ob) * ib
            t1 = (hi[node] - ob) * ib
            tmin = np.minimum(t0, t1).max(-1)
            tmax = np.maximum(t0, t1).min(-1)
            hit = (tmax >= np.maximum(tmin, 0))          # [8,128]
            rowhit = hit.any(-1)                          # [8]
            any_hit = rowhit.any()
            is_leaf = payload[node] != 0
            if any_hit and is_leaf:
                leaves += 1
                row_sweeps += int(rowhit.sum())
            node = node + 1 if (any_hit and not is_leaf) else skip[node]
    print(
        f"{mode}: steps/block={steps/n_blocks:.0f} leaves/block={leaves/n_blocks:.0f} "
        f"rows-per-leaf={row_sweeps/max(leaves,1):.2f}/8 "
        f"(sweep work x{8*leaves/max(row_sweeps,1):.2f} saved by row masks)"
    )
