"""A/B the MXU intersection kernel vs the SMEM VPU kernel on real TPU.

Run WITHOUT other JAX processes.  Usage:
    python scripts/bench_mxu_ab.py            # both arms, separate processes
    python scripts/bench_mxu_ab.py 0|1        # one arm
Plain min-of-N call timing (the bench.py methodology): a scan-of-frames
program is too large for the remote axon compiler; per-call relay overhead
is mitigated by taking the min over several calls."""
import os
import sys as _sys
_sys.path.insert(0, "/root/repo")
import sys
import time


def main(mxu):
    os.environ["MI_TPU_MXU_INTERSECT"] = "1" if mxu else "0"
    import jax
    import jax.numpy as jnp
    import mitsuba_tpu as mi
    from mitsuba_tpu.render_api import _render_pass

    mi.set_variant("llvm_ad_rgb")
    scene = mi.load_dict(mi.cornell_box())
    spp = 64

    def fwd(seed):
        L, _, _, aux = _render_pass(scene, jnp.uint32(seed), 0, spp, spp, 0)
        return L.sum(), aux["n_rays"]

    s, n_rays = fwd(0)
    s.block_until_ready()
    best = None
    for i in range(6):
        t0 = time.perf_counter()
        s, n_rays = fwd(i + 1)
        s.block_until_ready()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n = float(n_rays)
    print(f"mxu={int(mxu)}: frame {best*1e3:.1f} ms  {n/best/1e6:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1] == "1")
    else:
        import subprocess

        for arm in ("0", "1"):
            subprocess.run([sys.executable, __file__, arm], check=True)
