"""BVH sweep kernel throughput: coherent (primary-like) vs incoherent rays.

Run on TPU (default env, no other JAX procs).  Device time via slope:
k reps inside one jit (lax.scan), (t_k - t_1)/(k - 1).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def spherified_cube(k=130):
    """~6*k*k*2 triangles on a sphere."""
    verts, faces = [], []
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            base = len(verts)
            for i in range(k + 1):
                for j in range(k + 1):
                    uv = [-1 + 2 * i / k, -1 + 2 * j / k]
                    p = [0.0, 0.0, 0.0]
                    p[axis] = sgn
                    p[(axis + 1) % 3] = uv[0]
                    p[(axis + 2) % 3] = uv[1]
                    p = np.asarray(p)
                    verts.append(p / np.linalg.norm(p))
                    if i < k and j < k:
                        a = base + i * (k + 1) + j
                        b, c, d = a + 1, a + (k + 1), a + (k + 1) + 1
                        faces.append([a, b, d])
                        faces.append([a, d, c])
    V = np.asarray(verts, np.float32)
    F = np.asarray(faces, np.int32)
    v0 = V[F[:, 0]]
    e1 = V[F[:, 1]] - v0
    e2 = V[F[:, 2]] - v0
    return v0, e1, e2


def morton3(x, y, z, bits):
    out = np.zeros_like(x, dtype=np.uint64)
    for b in range(bits):
        out |= ((x >> b) & 1).astype(np.uint64) << (3 * b + 2)
        out |= ((y >> b) & 1).astype(np.uint64) << (3 * b + 1)
        out |= ((z >> b) & 1).astype(np.uint64) << (3 * b)
    return out


def sort_rays(o, d, bbox_min, bbox_max, o_bits=6, d_bits=4):
    """Sort key: morton(origin) high bits ++ morton(quantized dir) low bits.
    Shared-origin rays order by direction (image tiles); scattered origins
    group spatially first."""
    qo = ((o - bbox_min) / (bbox_max - bbox_min) * (1 << o_bits)).astype(np.int64)
    qo = np.clip(qo, 0, (1 << o_bits) - 1)
    qd = ((d * 0.5 + 0.5) * (1 << d_bits)).astype(np.int64)
    qd = np.clip(qd, 0, (1 << d_bits) - 1)
    key = (morton3(qo[:, 0], qo[:, 1], qo[:, 2], o_bits) << np.uint64(3 * d_bits)) \
        | morton3(qd[:, 0], qd[:, 1], qd[:, 2], d_bits)
    order = np.argsort(key, kind="stable")
    return o[order], d[order]


def make_rays(n, mode, seed=0):
    rng = np.random.default_rng(seed)
    if mode.startswith("coherent") or mode in ("tiled",):
        # camera at (0,0,4) looking at origin, 45deg fov, sqrt(n) grid
        w = int(np.sqrt(n))
        xs = (np.arange(n) % w + 0.5) / w * 2 - 1
        ys = (np.arange(n) // w + 0.5) / w * 2 - 1
        d = np.stack([xs * 0.41, ys * 0.41, -np.ones(n)], -1).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(np.asarray([[0, 0, 4.0]], np.float32), (n, 1))
        if mode == "tiled":
            w = int(np.sqrt(n))
            idx = np.arange(n)
            x = idx % w; y = idx // w
            tile = (y // 32) * (w // 32) + (x // 32)
            within = (y % 32) * 32 + (x % 32)
            order = np.argsort(tile * 1024 + within)
            o, d = o[order], d[order]
    elif mode == "miss":
        o = np.tile(np.asarray([[0, 0, 10.0]], np.float32), (n, 1))
        d = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (n, 1))
    else:
        o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def main():
    from mitsuba_tpu import native as native_mod
    from mitsuba_tpu.ops.bvh_sweep import bvh_sweep_intersect, MAX_WIDE_LEAF

    max_leaf = int(sys.argv[1]) if len(sys.argv) > 1 else MAX_WIDE_LEAF
    v0, e1, e2 = spherified_cube(130)
    T = v0.shape[0]
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=max_leaf)
    v0, e1, e2 = v0[order], e1[order], e2[order]
    print(f"tris={T} nodes={nodes.shape[0]} max_leaf={max_leaf}", flush=True)

    nbox = jnp.asarray(np.concatenate([nodes[:, 0:3], nodes[:, 3:6]], -1))
    nmeta = jnp.asarray(
        np.stack([nodes[:, 6].view(np.int32), nodes[:, 7].view(np.int32)], -1)
    )
    jv0, je1, je2 = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)

    N = 1 << 18
    mt = jnp.full((N,), np.inf, jnp.float32)

    def once(c, seed):
        jo, jd = c[1], c[2]
        # seed-dependent jitter + result feedback: prevents XLA from hoisting
        # the (otherwise loop-invariant) intersect out of the scan
        jo = jo + (seed.astype(jnp.float32) * 1e-12 + c[0].astype(jnp.float32) * 1e-12)
        t, p, u, v = bvh_sweep_intersect(nbox, nmeta, jv0, je1, je2, jo, jd, mt)
        return (c[0] + p.sum(), jo, jd), None

    @jax.jit
    def run_k(jo, jd, k_dummy):
        c, _ = jax.lax.scan(once, (jnp.int32(0), jo, jd), k_dummy)
        return c[0]

    for mode in ("coherent", "tiled", "incoherent", "sorted"):
        o, d = make_rays(N, "incoherent" if mode == "sorted" else mode)
        if mode == "sorted":
            o, d = sort_rays(o, d, np.float32([-2, -2, -2]), np.float32([2, 2, 2]))
        jo, jd = jnp.asarray(o), jnp.asarray(d)

        ts = {}
        for k in (1, 16):
            seeds = jnp.arange(k)
            r = run_k(jo, jd, seeds); r.block_until_ready()   # compile/warm
            best = None
            for _ in range(4):
                t0 = time.perf_counter()
                r = run_k(jo, jd, seeds); r.block_until_ready()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            ts[k] = best
        dev = (ts[16] - ts[1]) / 15
        print(f"{mode}: {N/dev/1e6:.2f} Mrays/s  ({dev*1e3:.1f} ms/launch)", flush=True)





# correctness probe (TPU): compare a handful of rays vs numpy brute force
def probe():
    from mitsuba_tpu import native as native_mod
    from mitsuba_tpu.ops.bvh_sweep import bvh_sweep_intersect, MAX_WIDE_LEAF
    v0, e1, e2 = spherified_cube(30)
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=MAX_WIDE_LEAF)
    v0, e1, e2 = v0[order], e1[order], e2[order]
    N = 2048
    o, d = make_rays(N, "incoherent", seed=3)
    nbox = jnp.asarray(np.concatenate([nodes[:, 0:3], nodes[:, 3:6]], -1))
    nmeta = jnp.asarray(np.stack([nodes[:, 6].view(np.int32), nodes[:, 7].view(np.int32)], -1))
    t, p, u, v = bvh_sweep_intersect(nbox, nmeta, jnp.asarray(v0), jnp.asarray(e1),
                                     jnp.asarray(e2), jnp.asarray(o), jnp.asarray(d),
                                     jnp.full((N,), np.inf, jnp.float32))
    t = np.asarray(t); p = np.asarray(p)
    bad = 0
    for i in range(0, N, 37):
        pv = np.cross(d[i], e2); det = (e1 * pv).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1 / np.where(det == 0, 1, det), 0)
        tv = o[i] - v0
        uu = (tv * pv).sum(-1) * inv
        qv = np.cross(tv, e1)
        vv = (d[i] * qv).sum(-1) * inv
        tt = (e2 * qv).sum(-1) * inv
        hit = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
        ref = tt[hit].min() if hit.any() else np.inf
        got = t[i] if p[i] >= 0 else np.inf
        if not (np.isclose(got, ref, rtol=1e-5) or (np.isinf(got) and np.isinf(ref))):
            bad += 1
    print(f"probe: {bad} mismatches of {len(range(0, N, 37))}", flush=True)


if __name__ == "__main__":
    probe()
    main()
