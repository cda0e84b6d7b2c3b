"""Standalone phase timings on real TPU: ray-gen, intersect (both kernels),
full frame.  Run ALONE (no other JAX process).  Slope-timed (axon relay
overhead is variable; memory: axon-tpu-env)."""
import os
import sys
sys.path.insert(0, "/root/repo")
import sys
import time

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
    from mitsuba_tpu.ops.intersect import tri_intersect, build_tri_table

    mi.set_variant("llvm_ad_rgb")
    scene = mi.load_dict(mi.cornell_box())
    spp = 64
    n = 256 * 256 * spp

    def gen(seed):
        rng, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        return ray.o.sum() + ray.d.sum()

    t_gen = time_scan(gen)
    print(f"ray-gen:            {t_gen*1e3:7.1f} ms")

    geom = scene.geometry.refresh()
    table = build_tri_table(geom)
    n_tri = jnp.asarray([geom.n_tris], jnp.int32)

    def isect(seed):
        _, ray, _, _, _ = make_wavefront(scene, seed, 0, n, 0, spp, spp, 0)
        t, p, u, v = tri_intersect(table, n_tri, ray.o, ray.d,
                                   jnp.full((n,), 1e9, jnp.float32))
        return t.sum() + u.sum()

    t_is = time_scan(isect)
    print(f"gen + 1x intersect: {t_is*1e3:7.1f} ms   (isect ~{(t_is-t_gen)*1e3:.1f} ms)")

    def frame(seed):
        L, _, _, _ = _render_pass(scene, seed, 0, spp, spp, 0)
        return L.sum()

    t_f = time_scan(frame)
    print(f"full frame:         {t_f*1e3:7.1f} ms")


if __name__ == "__main__":
    os.environ.setdefault("MI_TPU_MXU_INTERSECT", sys.argv[1] if len(sys.argv) > 1 else "0")
    main()
