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


def train_step_sharded(scene, mesh, param_paths, target, seed=0, spp=None, lr=0.05):
    """One distributed inverse-rendering step: forward + backward with the
    wavefront sharded over chips and parameter gradients psum-reduced over
    the 'rays' axis (the ICI all-reduce of BASELINE.json), followed by an SGD
    update of the selected scene parameters.

    param_paths: list of pytree paths (from scene.param_paths) to optimize.
    Returns (new_scene, loss)."""
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
            L, _, _, _ = render_lanes(
                s2, jnp.uint32(seed), lane0[0], n_local, 0, spp, spp, 0
            )
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
    loss, grads = jax.jit(shard_fn)(theta0, scene, lane_starts, target)
    for p, g in zip(param_paths, grads):
        scene = _tree_set(scene, p, _tree_get(scene, p) - lr * g)
    return scene, loss
