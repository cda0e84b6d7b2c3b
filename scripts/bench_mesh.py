"""End-to-end big-mesh render bench: ~200k-tri sphere in a Cornell box,
path integrator, TPU Pallas BVH path.  Also the /verify drive for the
large-mesh pipeline (finite image, plausible means, sphere visible)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def mesh_scene(k=130, res=256):
    from bench_bvh import spherified_cube
    import mitsuba_tpu as mi

    v0, e1, e2 = spherified_cube(k)
    V1 = v0
    V2 = v0 + e1
    V3 = v0 + e2
    verts = np.concatenate([V1, V2, V3], axis=0) * 0.35
    n = v0.shape[0]
    faces = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], -1)
    obj = "/tmp/bench_sphere.obj"
    with open(obj, "w") as f:
        for p in verts:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    del d["small-box"]
    d["mesh"] = {
        "type": "obj",
        "filename": obj,
        "to_world": {"type": "translate", "value": [0.2, -0.1, 0.2]},
        "bsdf": {"type": "diffuse", "reflectance": {"type": "rgb", "value": [0.6, 0.55, 0.5]}},
    }
    return mi.load_dict(d), n


def main():
    import mitsuba_tpu as mi
    from mitsuba_tpu.render_api import _render_pass

    mi.set_variant("llvm_ad_rgb")
    scene, ntri = mesh_scene()
    print(f"mesh tris={ntri}", flush=True)
    spp = 16

    img = np.asarray(mi.render(scene, spp=spp, seed=0))
    print("mean", img.mean(axis=(0, 1)), "max", img.max(), flush=True)
    assert np.isfinite(img).all() and img.min() >= 0.0

    def run(seed):
        L, _, _, aux = _render_pass(scene, jnp.uint32(seed), 0, spp, spp, 0)
        return L.sum(), aux["n_rays"]

    s, n_rays = run(0)
    jax.block_until_ready(s)
    best = None
    for i in range(4):
        t0 = time.perf_counter()
        s, n_rays = run(i + 1)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    mrays = float(n_rays) / best / 1e6
    print(f"mesh fwd: {mrays:.2f} Mrays/s ({best*1e3:.0f} ms, {int(n_rays)} rays)", flush=True)


if __name__ == "__main__":
    main()
