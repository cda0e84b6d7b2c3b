"""Mesh-scene frame decomposition on real TPU: depth slope, launch cost,
sort overhead, regeneration arm.  Run alone (no other JAX process)."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp


def time_scan(fn, k=4):
    def body(c, seed):
        return c + fn(seed), 0.0

    @jax.jit
    def run(seeds):
        c, _ = jax.lax.scan(body, 0.0, seeds)
        return c

    s1 = jnp.arange(1, dtype=jnp.uint32)
    sk = jnp.arange(k, dtype=jnp.uint32)
    run(s1).block_until_ready(); run(sk).block_until_ready()
    t0 = time.perf_counter(); run(s1).block_until_ready()
    t1 = time.perf_counter(); run(sk).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k - 1)


def main():
    import mitsuba_tpu as mi
    from mitsuba_tpu.render_api import _render_pass, make_wavefront
    from bench_mesh import mesh_scene

    mi.set_variant("llvm_ad_rgb")
    spp = 16
    scene, ntri = mesh_scene(k=130, res=256)
    n = 256 * 256 * spp
    print(f"tris={ntri} lanes={n}", flush=True)

    for depth in (1, 2, 4, 8):
        s2 = scene.replace(integrator=scene.integrator.replace(max_depth=depth))

        def frame(seed, s2=s2):
            L, _, _, aux = _render_pass(s2, seed, 0, spp, spp, 0)
            return L.sum()

        t = time_scan(frame)
        print(f"frame depth={depth}: {t*1e3:7.1f} ms", flush=True)

    geom = scene.geometry.refresh()
    s3 = scene.replace(geometry=geom)

    def isect(seed):
        rng, ray, _, _, _ = make_wavefront(s3, seed, 0, n, 0, spp, spp, 0)
        si = s3.ray_intersect(ray, jnp.ones((n,), bool))
        return si.t.sum()

    print(f"gen + 1 closest-hit (sorted): {time_scan(isect)*1e3:7.1f} ms", flush=True)

    def anyhit(seed):
        rng, ray, _, _, _ = make_wavefront(s3, seed, 0, n, 0, spp, spp, 0)
        from mitsuba_tpu.render.records import Ray
        occ = s3.ray_test(Ray(o=ray.o, d=ray.d, maxt=jnp.full((n,), 5.0)), jnp.ones((n,), bool))
        return occ.sum()

    print(f"gen + 1 any-hit (sorted):     {time_scan(anyhit)*1e3:7.1f} ms", flush=True)

    # sort overhead alone: argsort + gather of the ray SoA + inverse scatter
    def sortonly(seed):
        rng, ray, _, _, _ = make_wavefront(s3, seed, 0, n, 0, spp, spp, 0)
        from mitsuba_tpu.ops.bvh_sweep import ray_sort_key
        key = ray_sort_key(ray.o, ray.d, geom.bvh_lo[0], geom.bvh_hi[0])
        order = jnp.argsort(key)
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(n, dtype=order.dtype))
        t = ray.o[order].sum() + ray.d[order].sum()
        return t + inv.sum().astype(jnp.float32)

    print(f"gen + sort+gather only:       {time_scan(sortonly)*1e3:7.1f} ms", flush=True)

    # regeneration arm (wavefront compaction)
    s4 = scene.replace(integrator=scene.integrator.replace(regenerate=True))

    def regen_frame(seed):
        img = None
        from mitsuba_tpu.render_api import _render_regen_pass
        L_px, aux = _render_regen_pass(s4, seed, spp, 0)
        return L_px.sum()

    print(f"regen frame (spp {spp}):      {time_scan(regen_frame)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
