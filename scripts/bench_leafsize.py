"""A/B the full kernel across leaf sizes / flush depths on TPU (each config
in a subprocess: MI_BVH_* are read at import)."""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def worker():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bench_bvh import spherified_cube, make_rays, sort_rays
    from mitsuba_tpu import native as native_mod
    from mitsuba_tpu.ops import bvh_sweep as BS

    v0, e1, e2 = spherified_cube(130)
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=BS.MAX_WIDE_LEAF)
    v0, e1, e2 = v0[order], e1[order], e2[order]
    nbox = jnp.asarray(np.concatenate([nodes[:, 0:3], nodes[:, 3:6]], -1))
    nmeta = jnp.asarray(
        np.stack([nodes[:, 6].view(np.int32), nodes[:, 7].view(np.int32)], -1)
    )
    jv0, je1, je2 = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
    N = 1 << 18
    mt = jnp.full((N,), np.inf, jnp.float32)

    def once(c, seed):
        jo, jd = c[1], c[2]
        jo = jo + (seed.astype(jnp.float32) * 1e-12 + c[0].astype(jnp.float32) * 1e-12)
        t, p, u, v = BS.bvh_sweep_intersect(nbox, nmeta, jv0, je1, je2, jo, jd, mt)
        return (c[0] + p.sum(), jo, jd), None

    @jax.jit
    def run_k(jo, jd, k_dummy):
        c, _ = jax.lax.scan(once, (jnp.int32(0), jo, jd), k_dummy)
        return c[0]

    tag = (f"leaf={BS.MAX_WIDE_LEAF} lflush={BS.LFLUSH} nwin={BS.NWIN} "
           f"nodes={nodes.shape[0]}")
    for mode in ("tiled", "sorted"):
        o, d = make_rays(N, "incoherent" if mode == "sorted" else mode)
        if mode == "sorted":
            o, d = sort_rays(o, d, np.float32([-2, -2, -2]), np.float32([2, 2, 2]))
        jo, jd = jnp.asarray(o), jnp.asarray(d)
        ts = {}
        for k in (1, 16):
            seeds = jnp.arange(k)
            run_k(jo, jd, seeds).block_until_ready()
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                run_k(jo, jd, seeds).block_until_ready()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            ts[k] = best
        dev = (ts[16] - ts[1]) / 15
        print(f"{tag} {mode}: {N/dev/1e6:7.2f} Mrays/s ({dev*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
    else:
        for leaf, lflush in ((64, 16), (128, 8), (192, 8), (128, 16)):
            env = dict(os.environ, MI_BVH_LEAF=str(leaf),
                       MI_BVH_LFLUSH=str(lflush))
            subprocess.run(
                [sys.executable, __file__, "--worker"], env=env, check=True
            )
