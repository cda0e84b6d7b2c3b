"""Cbox shading decomposition on real TPU: isolates the surface-interaction
build, NEE, BSDF eval/sample, and emitter-hit blocks that make up the
non-intersect ~2/3 of a bounce.  Slope-timed; run ALONE."""
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
    from mitsuba_tpu.render_api import make_wavefront
    from mitsuba_tpu.ops.intersect import build_tri_table, tri_intersect

    mi.set_variant("llvm_ad_rgb")
    spp = 64
    n = 256 * 256 * spp
    scene = mi.load_dict(mi.cornell_box())
    geom = scene.geometry.refresh()
    scene = scene.replace(geometry=geom)
    table = build_tri_table(geom)
    n_tri = jnp.asarray([geom.n_tris], jnp.int32)

    def base(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        t, p, u, v = tri_intersect(table, n_tri, ray.o, ray.d,
                                   jnp.full((n,), 1e9, jnp.float32))
        return t.sum() + p.sum() + u.sum() + v.sum()

    t_base = time_scan(base)
    print(f"gen+kernel only:          {t_base*1e3:7.1f} ms", flush=True)

    def with_si(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        si = scene.ray_intersect(ray, jnp.ones((n,), bool))
        return si.p.sum() + si.n.sum() + si.uv.sum() + si.wi.sum()

    t_si = time_scan(with_si)
    print(f"gen+ray_intersect(si):    {t_si*1e3:7.1f} ms  (si build ~{(t_si-t_base)*1e3:.1f})", flush=True)

    def prep(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        si = scene.ray_intersect(ray, jnp.ones((n,), bool))
        return rng, ray, si

    act = jnp.ones((n,), bool)

    def nee_sample(seed):
        rng, ray, si = prep(seed)
        u0, u1, rng = rng.next_2d()
        u2, u3, rng = rng.next_2d()
        ds, w = scene.sample_emitter_direction(
            si.p, u0, jnp.stack([u1, u2], -1), None, act,
            test_visibility=False, ref_n=si.n,
        )
        return ds.d.sum() + ds.pdf.sum() + w.sum()

    print(f" + emitter sample:        {(time_scan(nee_sample)-t_si)*1e3:7.1f} ms", flush=True)

    def nee_eval(seed):
        rng, ray, si = prep(seed)
        u0, u1, rng = rng.next_2d()
        u2, u3, rng = rng.next_2d()
        ds, w = scene.sample_emitter_direction(
            si.p, u0, jnp.stack([u1, u2], -1), None, act,
            test_visibility=False, ref_n=si.n,
        )
        f, pdf = scene.bsdf_eval_pdf(si, si.to_local(ds.d), None, act)
        return f.sum() + pdf.sum() + w.sum()

    t_ne = time_scan(nee_eval)
    print(f" + bsdf_eval_pdf:         {(t_ne-time_scan(nee_sample))*1e3:7.1f} ms", flush=True)

    def bsdf_s(seed):
        rng, ray, si = prep(seed)
        u0, u1, rng = rng.next_2d()
        u2, u3, rng = rng.next_2d()
        b, w = scene.bsdf_sample(si, u0, jnp.stack([u2, u3], -1), None, act)
        return w.sum() + b.pdf.sum() + b.wo.sum()

    print(f" + bsdf_sample (vs si):   {(time_scan(bsdf_s)-t_si)*1e3:7.1f} ms", flush=True)

    def em_hit(seed):
        rng, ray, si = prep(seed)
        ev = scene.eval_emitter_hit(si, None)
        ep = scene.pdf_emitter_direction_hit(ray.o, si)
        en = scene.eval_environment(ray.d, None)
        epp = scene.pdf_emitter_direction_escaped(ray.d)
        return ev.sum() + ep.sum() + en.sum() + epp.sum()

    print(f" + emitter-hit evals:     {(time_scan(em_hit)-t_si)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
