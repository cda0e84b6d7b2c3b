"""Decompose cbox frame time into bounce components on real TPU.

Slope-timed (axon relay overhead is variable): every measurement is
(t_k - t_1)/(k-1) over a lax.scan of k frames inside ONE jit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_bounce.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def time_scan(fn, k=5):
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
    from mitsuba_tpu.render_api import make_wavefront, _render_pass
    from mitsuba_tpu.render.records import Ray

    mi.set_variant("llvm_ad_rgb")
    spp = 64
    n = 256 * 256 * spp

    # ---- frame-vs-depth slope: per-bounce cost ----
    for depth in (1, 2, 4, 8):
        d = mi.cornell_box()
        d["integrator"] = {"type": "path", "max_depth": depth}
        scene = mi.load_dict(d)

        def frame(seed, scene=scene):
            L, _, _, _ = _render_pass(scene, seed, 0, spp, spp, 0)
            return L.sum()

        t = time_scan(frame)
        print(f"frame depth={depth}:   {t*1e3:7.1f} ms", flush=True)

    scene = mi.load_dict(mi.cornell_box())
    scene = scene.replace(geometry=scene.geometry.refresh())

    def gen(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        return ray.o.sum() + ray.d.sum()

    print(f"ray-gen:            {time_scan(gen)*1e3:7.1f} ms", flush=True)

    # ---- single fused 2N intersect (the defer_nee per-bounce launch) ----
    def isect2(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        act = jnp.ones((n,), bool)
        si, occ = scene.ray_intersect_and_test(
            ray, Ray(o=ray.o, d=-ray.d, maxt=jnp.full((n,), 10.0)), act, act
        )
        return si.t.sum() + occ.sum()

    print(f"gen + fused 2N isect: {time_scan(isect2)*1e3:7.1f} ms", flush=True)

    # ---- NEE block: sample_emitter_direction + bsdf_eval_pdf ----
    def nee(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        act = jnp.ones((n,), bool)
        si = scene.ray_intersect(ray, act)
        u0, u1, rng = rng.next_2d()
        u2, u3, rng = rng.next_2d()
        ds, w = scene.sample_emitter_direction(
            si.p, u0, jnp.stack([u1, u2], -1), None, act,
            test_visibility=False, ref_n=si.n,
        )
        wo_l = si.to_local(ds.d)
        f, pdf = scene.bsdf_eval_pdf(si, wo_l, None, act)
        return f.sum() + pdf.sum() + w.sum()

    t_nee = time_scan(nee)
    print(f"gen+isect+NEE:      {t_nee*1e3:7.1f} ms", flush=True)

    # ---- BSDF sampling block ----
    def bs(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        act = jnp.ones((n,), bool)
        si = scene.ray_intersect(ray, act)
        u0, u1, rng = rng.next_2d()
        u2, u3, rng = rng.next_2d()
        b, w = scene.bsdf_sample(si, u0, jnp.stack([u1, u2], -1), None, act)
        return w.sum() + b.pdf.sum()

    print(f"gen+isect+bsdf_sample: {time_scan(bs)*1e3:7.1f} ms", flush=True)

    # ---- RNG cost: 7 next_2d draws ----
    def rngonly(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        tot = 0.0
        for _ in range(7):
            a, b, rng = rng.next_2d()
            tot = tot + a.sum() + b.sum()
        return tot

    print(f"gen + 7x next_2d:   {time_scan(rngonly)*1e3:7.1f} ms", flush=True)

    # ---- emitter-hit/env eval block ----
    def emhit(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        act = jnp.ones((n,), bool)
        si = scene.ray_intersect(ray, act)
        ev = scene.eval_emitter_hit(si, None)
        ep = scene.pdf_emitter_direction_hit(ray.o, si)
        return ev.sum() + ep.sum()

    print(f"gen+isect+emitter_hit: {time_scan(emhit)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
