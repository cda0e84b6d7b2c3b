"""Benchmark: cornell box path tracing throughput on the current device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: Mrays/s (closest-hit + shadow rays counted by the integrator itself)
on the BASELINE.json config-1 scene (cornell_box 256x256 @ 64spp, path
integrator, max_depth 8).  The reference publishes no numbers (BASELINE.md);
vs_baseline is computed against a nominal 10 Mrays/s for the reference's LLVM
CPU backend on this scene class (order-of-magnitude figure for a multicore
CPU wavefront path tracer).
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS = 10.0


def main():
    import mitsuba_tpu as mi
    from mitsuba_tpu.render_api import _render_pass

    mi.set_variant("llvm_ad_rgb")
    d = mi.cornell_box()
    scene = mi.load_dict(d)
    spp = 64
    n_lanes = 256 * 256 * spp

    def run(seed):
        L, _, _, aux = _render_pass(scene, jnp.uint32(seed), 0, spp, spp, 0)
        return L.sum(), aux["n_rays"]

    # warmup/compile
    s, n_rays = run(0)
    s.block_until_ready()

    best = None
    for i in range(3):
        t0 = time.perf_counter()
        s, n_rays = run(i + 1)
        s.block_until_ready()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    total_rays = float(n_rays)
    mrays = total_rays / best / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/s fwd (cbox path 256x256@64spp)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
                "detail": {
                    "device": str(jax.devices()[0]),
                    "wall_s": round(best, 4),
                    "rays": int(total_rays),
                    "lanes": n_lanes,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
