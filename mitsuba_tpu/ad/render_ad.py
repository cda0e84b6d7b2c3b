"""render() custom VJP wiring for PRB integrators.

The reference intercepts AD on mi.render via a dr.CustomOp (_RenderOp,
reference: util.py:356-408) that dispatches to RBIntegrator.render_backward
(common.py:828-983): primal pass -> image; backward: differentiate only the
splatting -> per-sample adjoint dL -> replay pass.  Here the per-lane render
pass is the custom_vjp boundary: everything after it (film develop, spectral
-> sRGB) is cheap jnp math that tape-AD handles, so dL arrives per lane
automatically.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .prb import FLOAT0, assemble_scene_cotangent


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def prb_pass_lanes(scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx):
    """Radiance [n, C] for lanes [lane0, lane0+n) with PRB gradients w.r.t.
    scene parameters.  `lane0` is traced, so one compile serves every chip of
    a shard_map over the wavefront axis (the per-lane RNG is keyed by global
    sample index — partition-invariant, reference: integrator.cpp:230)."""
    from ..render_api import make_wavefront

    rng, ray, wavelengths, _, _ = make_wavefront(
        scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx
    )
    active = jnp.ones((n,), bool)
    L, _ = scene.integrator.sample(scene, rng, ray, wavelengths, active)
    if scene.polarized and L.ndim == 3:
        from ..render_api import to_sensor_mueller

        L = to_sensor_mueller(jax.lax.stop_gradient(ray.d), L)
    return L


def _prb_pass_lanes_fwd(scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx):
    L = prb_pass_lanes(scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx)
    return L, (scene, seed, lane0, L)


def _prb_pass_lanes_bwd(n, pass_base, spp_pass, spp_total, sensor_idx, res, dL):
    scene, seed, lane0, L = res
    from ..render_api import make_wavefront

    rng, ray, wavelengths, _, _ = make_wavefront(
        scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx
    )
    active = jnp.ones((n,), bool)
    if scene.polarized and dL.ndim == 3:
        # the forward rotated L into the sensor Stokes frame; pull the film
        # adjoint back into the integrator frame (R orthogonal: R^-1 = R^T)
        from ..render_api import sensor_stokes_rotation

        R = sensor_stokes_rotation(ray.d)
        dL = jnp.einsum("nji,ncj->nci", R, dL)
        L = jnp.einsum("nji,ncj->nci", R, L)
    grads = scene.integrator.sample_backward(
        scene, rng, ray, wavelengths, dL, L, active
    )
    ct_scene = assemble_scene_cotangent(scene, grads)
    ct_seed = np.zeros((), FLOAT0)
    ct_lane0 = np.zeros((), FLOAT0)
    return ct_scene, ct_seed, ct_lane0


prb_pass_lanes.defvjp(_prb_pass_lanes_fwd, _prb_pass_lanes_bwd)


def prb_pass(scene, seed, pass_base, spp_pass, spp_total, sensor_idx):
    """Full-film PRB pass (all lanes of one wavefront)."""
    from ..render_api import _pass_lanes

    n = _pass_lanes(scene.film, spp_pass)
    return prb_pass_lanes(
        scene, seed, jnp.uint32(0), n, pass_base, spp_pass, spp_total, sensor_idx
    )


# ---------------------------------------------------------------------------
# Regenerative PRB: custom-vjp boundary for the compacted wavefront
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def prb_regen_px(scene, seed, spp, sensor_idx):
    """Sample-summed per-pixel radiance [n_pixels, C] under path
    regeneration, with PRB gradients.  Forward = the integrator's regen_render
    (path_regen_render / volpath_regen_render); backward = the regenerative
    replay (regen_backward) seeded with the per-sample primal radiances the
    forward pass records."""
    L_px, _ = scene.integrator.regen_render(scene, seed, spp, sensor_idx)
    return L_px


def _prb_regen_px_fwd(scene, seed, spp, sensor_idx):
    L_px, aux = scene.integrator.regen_render(
        scene, seed, spp, sensor_idx, record_samples=True
    )
    return L_px, (scene, seed, aux["L_samples"])


def _prb_regen_px_bwd(spp, sensor_idx, res, dL_px):
    scene, seed, L_samples = res
    grads = scene.integrator.regen_backward(
        scene, seed, spp, sensor_idx, dL_px, L_samples
    )
    ct_scene = assemble_scene_cotangent(scene, grads)
    return ct_scene, np.zeros((), FLOAT0)


prb_regen_px.defvjp(_prb_regen_px_fwd, _prb_regen_px_bwd)
