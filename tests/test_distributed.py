"""Real multi-process jax.distributed smoke test (SURVEY.md §5 requirement;
VERDICT r4 item 6): two CPU processes with 2 virtual devices each form a
4-device cross-process 'rays' mesh; the sharded PRB gradient step runs with
the parameter psum riding the cross-process mesh, and its loss/grads match
the single-process result."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mitsuba_tpu as mi

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_grad_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    # jax.distributed.initialize must run before anything touches the XLA
    # backend — drop the axon sitecustomize dir (it imports jax and probes
    # devices at interpreter startup) and keep the workers CPU-only
    keep = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(["/root/repo"] + keep)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # the psum makes loss/grad identical (replicated) on every process
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    np.testing.assert_allclose(outs[0]["grad"], outs[1]["grad"], rtol=1e-6)

    # single-process reference on the same workload (this test process has
    # its own 8 virtual devices; a 1-device mesh is the unsharded baseline)
    from mitsuba_tpu.parallel.sharding import make_mesh, grad_step_sharded

    mi.set_variant("llvm_ad_rgb")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = {"type": "prb", "max_depth": 3}
    scene = mi.load_dict(d)
    spp = 4
    target = np.zeros((8 * 8 * spp, 3), np.float32)
    path = dict(scene.param_paths)["white.reflectance.value"]
    loss_ref, grads_ref = grad_step_sharded(
        scene, make_mesh(1), (path,), target, seed=7, spp=spp
    )
    assert outs[0]["loss"] == pytest.approx(float(np.asarray(loss_ref)), rel=1e-4)
    np.testing.assert_allclose(
        outs[0]["grad"], np.asarray(grads_ref[0]).ravel(), rtol=1e-4
    )
