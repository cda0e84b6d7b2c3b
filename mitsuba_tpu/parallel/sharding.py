"""Multi-chip scale-out: rays sharded over a device mesh, scene replicated,
parameter gradients psum-reduced over ICI.

The reference is single-process (SURVEY.md §2 'Parallelism inventory'); its
data-parallel axis is the wavefront of W*H*spp samples.  On TPU that axis is
sharded across chips with jax.shard_map over a 1-D 'rays' mesh:

  * scene/medium parameters: REPLICATED (in_specs P())
  * lane chunks: one contiguous block per chip, RNG keyed by global sample id
    so the image is bit-identical to the single-chip render
  * film assembly: per-chip partial accumulation, all-gather (out_specs
    P('rays')) or psum for reductions like render_1
  * gradients of replicated parameters: psum over 'rays' inside the shard_map
    body, overlapped with the backward sweep by XLA

(BASELINE.json north star: 'rays/pixels sharded per chip..., scene/medium
parameter gradients all-reduced over ICI'.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render_api import render_lanes, _pass_lanes
from ..render.film import develop
from ..core import spectrum as spec


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), ("rays",))


def render_sharded(scene, mesh, seed=0, spp=None, sensor=0):
    """Distributed forward render -> [H, W, C] image, bit-identical to the
    single-chip result (lane-partition invariance of the RNG keying)."""
    film = scene.film
    spp = spp or scene.spp
    n_total = _pass_lanes(film, spp)
    n_dev = mesh.devices.size
    assert n_total % n_dev == 0, "lanes must divide evenly across chips"
    n_local = n_total // n_dev

    lane_starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(n_local)

    def local(scene, lane0):
        L, wl, wl_pdf, _ = render_lanes(
            scene, jnp.uint32(seed), lane0[0], n_local, 0, spp, spp, sensor
        )
        if scene.n_channels == 4 and wl is not None:
            xyz = spec.spectrum_to_xyz(L, wl, wl_pdf)
            L = jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
        return L

    shard_fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P("rays")), out_specs=P("rays"),
        check_vma=False,
    )
    L = jax.jit(shard_fn)(scene, lane_starts)
    return develop(film, L, spp)


def _lane_render(scene, seed, lane0, n_local, spp, sensor):
    """Per-chip lane render, dispatching PRB integrators through their
    custom-vjp replay (reference: _RenderOp -> render_backward,
    util.py:356-408) and plain integrators through tape AD."""
    if getattr(scene.integrator, "is_prb", False):
        from ..ad.render_ad import derive_seed_grad, prb_pass_lanes

        return prb_pass_lanes(
            scene, jnp.uint32(seed), derive_seed_grad(seed), lane0, n_local, 0,
            spp, spp, sensor,
        )
    L, _, _, _ = render_lanes(
        scene, jnp.uint32(seed), lane0, n_local, 0, spp, spp, sensor
    )
    return L


def _mesh_spans_processes(mesh):
    """True when the mesh contains devices owned by other processes (a
    multi-host run entered via init_distributed)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _to_global(mesh, spec, x):
    """Lift a host-local value to a global jax.Array over a (possibly
    multi-process) mesh: every process supplies the shards it addresses,
    sliced from the full logical value (which each host can construct —
    scene parameters are replicated state, lane/target partitions are pure
    arithmetic).  The multi-host analog of jax.device_put."""
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


def grad_step_sharded(scene, mesh, param_paths, target, seed=0, spp=None, sensor=0):
    """Distributed inverse-rendering gradient: forward + backward with the
    wavefront sharded over chips and parameter gradients psum-reduced over
    the 'rays' axis (the ICI all-reduce of BASELINE.json).

    The backward pass is the integrator's own PRB replay (custom_vjp) when
    the integrator is a PRB family member — the flagship path — falling back
    to tape AD for plain integrators.  Returns (loss, grads) with grads a
    tuple aligned with param_paths, identical (up to float reduction order)
    to the single-chip gradient because the per-lane RNG is keyed by global
    sample index."""
    from ..render.params import _tree_get, _tree_set

    film = scene.film
    spp = spp or scene.spp
    n_total = _pass_lanes(film, spp)
    n_dev = mesh.devices.size
    assert n_total % n_dev == 0, "lanes must divide evenly across chips"
    n_local = n_total // n_dev
    lane_starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(n_local)

    theta0 = tuple(_tree_get(scene, p) for p in param_paths)

    def local(theta, scene, lane0, target):
        def loss_local(theta):
            s2 = scene
            for p, v in zip(param_paths, theta):
                s2 = _tree_set(s2, p, v)
            L = _lane_render(s2, seed, lane0[0], n_local, spp, sensor)
            # target arrives pre-sharded: this chip's lane block
            return jnp.sum((L - target) ** 2) / n_total

        loss, grads = jax.value_and_grad(loss_local)(theta)
        loss = jax.lax.psum(loss, "rays")
        grads = jax.lax.psum(grads, "rays")   # parameter all-reduce over ICI
        return loss, grads

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("rays"), P("rays")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if _mesh_spans_processes(mesh):
        # multi-host: jit over a cross-process mesh needs global jax.Arrays
        theta0 = tuple(_to_global(mesh, P(), t) for t in theta0)
        scene = jax.tree_util.tree_map(partial(_to_global, mesh, P()), scene)
        lane_starts = _to_global(mesh, P("rays"), lane_starts)
        target = _to_global(mesh, P("rays"), target)
    return jax.jit(shard_fn)(theta0, scene, lane_starts, target)


def train_step_sharded(scene, mesh, param_paths, target, seed=0, spp=None, lr=0.05):
    """One distributed step: sharded PRB/tape gradient + SGD update of the
    selected scene parameters.  Returns (new_scene, loss)."""
    from ..render.params import _tree_get, _tree_set

    loss, grads = grad_step_sharded(scene, mesh, param_paths, target, seed, spp)
    for p, g in zip(param_paths, grads):
        scene = _tree_set(scene, p, _tree_get(scene, p) - lr * g)
    return scene, loss


def scaling_efficiency(scene, param_paths, target, n_devices, seed=0, spp=None,
                       iters=3):
    """Measure scaling of the sharded gradient step: wall-time(1 device) /
    wall-time(n devices) on the SAME total wavefront (BASELINE.md target:
    >=90% at full mesh).

    A virtual host-platform mesh (xla_force_host_platform_device_count) runs
    every 'device' on the same physical cores, so same-total-work speedup is
    physically capped at ~1x there.  In that case the meaningful figures are
    (a) the sharding OVERHEAD ratio t_n/t_1 (collective + dispatch cost on
    top of the compute, ideal ~1.0) and (b) that the compiled module actually
    contains the parameter all-reduce; `efficiency` is reported as None.
    On a real multi-chip backend the true efficiency is reported."""
    import time

    times = {}
    for nd in (1, n_devices):
        mesh = make_mesh(nd)
        # compile
        loss, grads = grad_step_sharded(
            scene, mesh, param_paths, target, seed, spp
        )
        jax.block_until_ready((loss, grads))
        t0 = time.perf_counter()
        for it in range(iters):
            loss, grads = grad_step_sharded(
                scene, mesh, param_paths, target, seed + 1 + it, spp
            )
        jax.block_until_ready((loss, grads))
        times[nd] = (time.perf_counter() - t0) / iters

    virtual = all(d.platform == "cpu" for d in jax.devices()[:n_devices])
    speedup = times[1] / times[n_devices]
    out = {
        "t_1dev_s": times[1],
        "t_ndev_s": times[n_devices],
        "speedup": speedup,
        "n_devices": n_devices,
        "virtual_mesh": virtual,
    }
    if virtual:
        out["efficiency"] = None
        out["overhead_ratio"] = times[n_devices] / times[1]
    else:
        out["efficiency"] = speedup / n_devices
    return out


def sharded_step_has_allreduce(scene, mesh, param_paths, target, seed=0,
                               spp=None):
    """True iff the compiled sharded gradient step contains a cross-chip
    all-reduce of the parameter gradients — the structural check that the
    psum rides the mesh (the compile-time analog of the reference's
    kernel-count regression, test_megakernel.py)."""
    from ..render.params import _tree_get, _tree_set

    film = scene.film
    spp = spp or scene.spp
    n_total = _pass_lanes(film, spp)
    n_dev = mesh.devices.size
    n_local = n_total // n_dev
    lane_starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(n_local)
    theta0 = tuple(_tree_get(scene, p) for p in param_paths)

    def local(theta, scene, lane0, target):
        def loss_local(theta):
            s2 = scene
            for p, v in zip(param_paths, theta):
                s2 = _tree_set(s2, p, v)
            L = _lane_render(s2, seed, lane0[0], n_local, spp, 0)
            return jnp.sum((L - target) ** 2) / n_total

        loss, grads = jax.value_and_grad(loss_local)(theta)
        return jax.lax.psum(loss, "rays"), jax.lax.psum(grads, "rays")

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P("rays"), P("rays")),
        out_specs=(P(), P()), check_vma=False,
    ))
    hlo = fn.lower(theta0, scene, lane_starts, target).compile().as_text()
    return ("all-reduce" in hlo) or ("all_reduce" in hlo)


# Multi-host entry point — lives in parallel/distributed.py (a
# dependency-free module importable BEFORE the package initializes the XLA
# backend); re-exported here for API continuity.
from .distributed import init_distributed  # noqa: E402, F401


def render_sharded_multipass(scene, mesh, seed=0, spp=None, spp_per_pass=None,
                             sensor=0):
    """Distributed render with the spp axis split into sequential passes to
    bound per-chip HBM (the sharded analog of render()'s multi-pass loop).
    Bit-identical to the single-chip, single-pass render: lanes are keyed by
    global sample id, so neither the chip partition nor the pass
    decomposition changes any sample's RNG stream."""
    film = scene.film
    spp = spp or scene.spp
    spp_per_pass = spp_per_pass or spp
    assert spp % spp_per_pass == 0
    n_dev = mesh.devices.size
    n_pass_lanes = _pass_lanes(film, spp_per_pass)
    assert n_pass_lanes % n_dev == 0
    n_local = n_pass_lanes // n_dev
    lane_starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(n_local)

    def local(scene, lane0, pass_base):
        L, wl, wl_pdf, _ = render_lanes(
            scene, jnp.uint32(seed), lane0[0], n_local, pass_base[0],
            spp_per_pass, spp, sensor
        )
        if scene.n_channels == 4 and wl is not None:
            xyz = spec.spectrum_to_xyz(L, wl, wl_pdf)
            L = jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
        return L

    shard_fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P("rays"), P()), out_specs=P("rays"),
        check_vma=False,
    ))

    acc = None
    for p in range(spp // spp_per_pass):
        L = shard_fn(scene, lane_starts, jnp.asarray([p * spp_per_pass], jnp.uint32))
        # lanes are pixel-major within a pass: [n_pixels * spp_pass, C]
        img = develop(film, L, spp_per_pass)
        acc = img if acc is None else acc + img
    return acc / (spp // spp_per_pass)
