"""Worker process for the multi-process jax.distributed smoke test
(tests/test_distributed.py).  Each of 2 processes owns 2 virtual CPU
devices; together they form a 4-device 'rays' mesh spanning processes.

Usage: python _distributed_worker.py <process_id> <coordinator_port>
Prints one JSON line: {"loss": ..., "grad": [...]} computed by the sharded
gradient step (parameter psum rides the cross-process mesh)."""
import json
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    "--xla_backend_optimization_level=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

    # initialize the process group BEFORE importing mitsuba_tpu (the package
    # import builds jnp tables, which initializes the XLA backend) — load the
    # dependency-free distributed module by path, as a launcher would
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mtpu_distributed",
        os.path.join(os.path.dirname(__file__), "..", "mitsuba_tpu",
                     "parallel", "distributed.py"),
    )
    dist = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dist)
    devices = dist.init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )

    import mitsuba_tpu as mi
    from mitsuba_tpu.parallel.sharding import make_mesh, grad_step_sharded
    assert jax.process_count() == 2, jax.process_count()
    assert len(devices) == 4, devices
    assert len(jax.local_devices()) == 2

    mi.set_variant("llvm_ad_rgb")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = {"type": "prb", "max_depth": 3}
    scene = mi.load_dict(d)

    spp = 4
    n_total = 8 * 8 * spp
    target = np.zeros((n_total, 3), np.float32)
    key = "white.reflectance.value"
    path = dict(scene.param_paths)[key]

    mesh = make_mesh(devices=devices)
    loss, grads = grad_step_sharded(
        scene, mesh, (path,), target, seed=7, spp=spp
    )
    loss = float(np.asarray(loss))
    grad = np.asarray(grads[0]).ravel().tolist()
    print(json.dumps({"pid": pid, "loss": loss, "grad": grad}), flush=True)


if __name__ == "__main__":
    main()
