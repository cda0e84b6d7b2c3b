"""Speed-of-light model for the BVH sweep kernel (VERDICT r4 item 1a).

Makes the BASELINE.md ">= 80% speed-of-light" target falsifiable for the
mesh-scale workload: computes, from MEASURED walk statistics (the numpy
union-walk of scripts/count_rowmask.py) and v5e hardware numbers, the
attainable Mrays/s of the block-shared traversal design per wavefront class,
and compares with the measured kernel throughput (scripts/bench_ablate.py).

Cost model per 1024-ray block (see ops/bvh_sweep.py):
  * window tests: S node visits x ~24 VPU ops on [8, 128]  -> vector time
  * leaf sweeps:  R row-sweeps x (WBUF/8) chunks x ~65 ops on [1, 128]
  * leaf DMA:     L copies x WBUF x 128 x 4 B               -> HBM time
  * scalar walk:  S inner steps x ~tau_walk cycles + (S/NWIN + L/LFLUSH)
                  outer-loop iterations x ~tau_sync cycles  -> scalar time
  attainable t_block = max(vector + scalar, dma)   [DMA overlaps compute]

Hardware (TPU v5e, public numbers): VPU ~= 1024 f32 lanes x 2 ops x 1.74 GHz
~= 3.6e12 ops/s; HBM ~= 819 GB/s; clock 1.74 GHz.  tau_sync ~= 500 cycles
(measured in r3 by the window-batching A/B), tau_walk ~= 12 cycles.

Run on CPU (numpy only): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/roofline_bvh.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

VPU_OPS = 3.6e12          # f32 VPU ops/s (8x128 lanes x 2 x 1.74 GHz)
HBM_BPS = 819e9           # HBM bandwidth B/s
CLOCK = 1.74e9            # Hz
TAU_SYNC = 500            # outer while_loop per-iteration sync, cycles
TAU_WALK = 12             # inner scalar walk step, cycles
OPS_NODE = 24             # slab test + row-mask reduce, ops per node per lane
OPS_CHUNK = 65            # Moller-Trumbore 8x128 tile, ops per element


def walk_stats(max_leaf=64, n=1 << 15):
    """Union-walk statistics per 1024-ray block for the 202k-tri bench mesh,
    per wavefront class (tiled primaries / sorted bounce / raw incoherent).
    Identical logic to scripts/count_rowmask.py."""
    from bench_bvh import spherified_cube, make_rays, sort_rays
    from mitsuba_tpu import native as native_mod

    v0, e1, e2 = spherified_cube(130)
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, _ = native_mod.build_bvh_wide(tris9, max_leaf=max_leaf)
    lo, hi = nodes[:, 0:3], nodes[:, 3:6]
    skip = nodes[:, 6].view(np.int32)
    payload = nodes[:, 7].view(np.int32)

    out = {}
    for mode in ("tiled", "sorted", "incoherent"):
        if mode == "tiled":
            o2, d2 = make_rays(1 << 20, "coherent")
            idx = np.arange(1 << 20)
            x = idx % 1024
            y = idx // 1024
            t_ = (y // 32) * 32 + (x // 32)
            w_ = (y % 32) * 32 + (x % 32)
            order2 = np.argsort(t_ * 1024 + w_)
            mid = (1 << 19) - n // 2     # central tiles (corner tiles miss)
            o, d = o2[order2][mid:mid + n], d2[order2][mid:mid + n]
        else:
            o, d = make_rays(n, "incoherent")
            if mode == "sorted":
                o, d = sort_rays(o, d, np.float32([-2] * 3), np.float32([2] * 3))
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        n_blocks = n // 1024
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
                hit = tmax >= np.maximum(tmin, 0)
                rowhit = hit.any(-1)
                any_hit = rowhit.any()
                is_leaf = payload[node] != 0
                if any_hit and is_leaf:
                    leaves += 1
                    row_sweeps += int(rowhit.sum())
                node = node + 1 if (any_hit and not is_leaf) else skip[node]
        out[mode] = dict(
            S=steps / n_blocks, L=leaves / n_blocks, R=row_sweeps / n_blocks
        )
    return out


def attainable(stats, max_leaf=64, nwin=32, lflush=16):
    """Attainable Mrays/s per wavefront class from the cost model."""
    wbuf = max_leaf + 8
    out = {}
    for mode, s in stats.items():
        S, L, R = s["S"], s["L"], s["R"]
        t_window = S * OPS_NODE * 1024 / VPU_OPS
        t_sweep = R * (wbuf // 8) * OPS_CHUNK * 128 / VPU_OPS
        t_scalar = (S * TAU_WALK + (S / nwin + L / lflush) * TAU_SYNC) / CLOCK
        t_dma = L * wbuf * 128 * 4 / HBM_BPS
        t_block = max(t_window + t_sweep + t_scalar, t_dma)
        out[mode] = dict(
            s,
            t_window_us=t_window * 1e6, t_sweep_us=t_sweep * 1e6,
            t_scalar_us=t_scalar * 1e6, t_dma_us=t_dma * 1e6,
            attainable_mrays=1024 / t_block / 1e6,
        )
    return out


def main():
    stats = walk_stats()
    model = attainable(stats)
    print(f"{'mode':<11} {'S/blk':>6} {'L/blk':>6} {'rows':>6} "
          f"{'win us':>7} {'swp us':>7} {'scl us':>7} {'dma us':>7} "
          f"{'attainable':>11}")
    for mode, m in model.items():
        print(f"{mode:<11} {m['S']:>6.0f} {m['L']:>6.0f} {m['R']:>6.0f} "
              f"{m['t_window_us']:>7.1f} {m['t_sweep_us']:>7.1f} "
              f"{m['t_scalar_us']:>7.1f} {m['t_dma_us']:>7.1f} "
              f"{m['attainable_mrays']:>8.1f} Mray/s")
    print("""
Measured (scripts/bench_ablate.py, r5, 2^18-ray launches, v5e):
  tiled   full: ~24 Mrays/s     sorted-incoherent full: ~3.3 Mrays/s
Model verdict: at the adversarial sorted-incoherent walk statistics the
block-shared design's attainable rate is ~11 Mrays/s (scalar walk + window
tests dominate); the kernel measures ~3.3, i.e. ~30% of modeled attainable.
The residual is a Mosaic scheduling interaction around the DMA-fed sweep
buffers (see ops/bvh_sweep.py round-5 negative results).  NOTE the synthetic
'sorted' wavefront (random origins in the scene box x random directions) is
far more divergent than the renderer's actual bounce wavefronts, which
originate on surfaces and carry a root-cull bit; the end-to-end mesh figure
in bench.py is the meaningful product metric.""")


if __name__ == "__main__":
    main()
