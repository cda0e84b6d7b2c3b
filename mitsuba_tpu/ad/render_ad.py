"""render() custom VJP wiring for PRB integrators.

The reference intercepts AD on mi.render via a dr.CustomOp (_RenderOp,
reference: util.py:356-408) that dispatches to RBIntegrator.render_backward
(common.py:828-983): the backward runs its OWN primal pass + replay pass,
both seeded with `seed_grad` != `seed` — the primal/differential phases are
decorrelated ("The primal and differential seed should be different to ensure
unbiased gradient computation!", util.py:620-622).  Correlated seeds bias any
nonlinear loss: E[g(X) dX] picks up Cov(g(X), dX) when the same sample noise
drives both the image X and the gradient estimate dX.

Here the per-lane render pass is the custom_vjp boundary.  The spectral
contraction (SRF / XYZ->sRGB) and the polarized sensor-frame rotation live
INSIDE the boundary so the incoming cotangent dL is a per-pixel film adjoint
that is independent of the pass RNG: the lane->pixel map under filter
importance sampling is static (lane // spp), so the stored dL is exactly the
adjoint of the backward pass's fresh lanes too.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .prb import FLOAT0, assemble_scene_cotangent


def _postprocess(scene, L, ray_d, wavelengths, wl_pdf, raw=False):
    """Per-lane measurement conversion applied inside the vjp boundary:
    polarized sensor Stokes rotation (reference: to_sensor_mueller,
    common.py:304-326) and spectral contraction (specfilm SRF channels /
    XYZ->sRGB, reference: specfilm.cpp + integrator.cpp:1189).  With
    raw=True the spectral contraction is skipped (render_1/render_test
    return raw wavelength channels, reference common.py:113-196) while the
    sensor Stokes rotation still applies (common.py:160-161)."""
    if scene.polarized and L.ndim == 3:
        from ..render_api import to_sensor_mueller

        return to_sensor_mueller(jax.lax.stop_gradient(ray_d), L)
    if raw:
        return L
    if scene.n_channels == 4 and wavelengths is not None and not scene.polarized:
        from ..core import spectrum as spec

        film = scene.film
        inv_pdf = 1.0 / jnp.maximum(jax.lax.stop_gradient(wl_pdf), 1e-12)
        if film.srfs:
            uv0 = jnp.zeros((L.shape[0], 2), jnp.float32)
            return jnp.stack(
                [
                    jnp.mean(srf.eval(uv0, wavelengths, 4) * L * inv_pdf, -1) / norm
                    for srf, norm in zip(film.srfs, film.srf_norms)
                ],
                axis=-1,
            )
        xyz = spec.spectrum_to_xyz(L, wavelengths, jax.lax.stop_gradient(wl_pdf))
        return jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
    return L


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def prb_pass_lanes(
    scene, seed, seed_grad, lane0, n, pass_base, spp_pass, spp_total, sensor_idx,
    raw=False, spp_grad=None,
):
    """Measurement [n, C] for lanes [lane0, lane0+n) with PRB gradients w.r.t.
    scene parameters.  `lane0` is traced, so one compile serves every chip of
    a shard_map over the wavefront axis (the per-lane RNG is keyed by global
    sample index — partition-invariant, reference: integrator.cpp:230).
    `seed_grad` seeds the backward-pass primal+replay (decorrelated gradient,
    reference: util.py:617-622).  `spp_grad` sets the backward pass's own
    sample count (reference: the spp_grad argument of mi.render,
    util.py:551-560); None/equal keeps the forward lane set.  Only valid for
    single-pass renders on mean-develop (FIS) films, where the per-lane film
    adjoint is uniformly A_px/spp and refolds exactly to a different spp."""
    from ..render_api import make_wavefront

    rng, ray, wavelengths, wl_pdf, _ = make_wavefront(
        scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx
    )
    active = jnp.ones((n,), bool)
    L, _ = scene.integrator.sample(scene, rng, ray, wavelengths, active)
    return _postprocess(scene, L, ray.d, wavelengths, wl_pdf, raw)


def _prb_pass_lanes_fwd(
    scene, seed, seed_grad, lane0, n, pass_base, spp_pass, spp_total, sensor_idx,
    raw=False, spp_grad=None,
):
    L = prb_pass_lanes(
        scene, seed, seed_grad, lane0, n, pass_base, spp_pass, spp_total, sensor_idx,
        raw, spp_grad,
    )
    return L, (scene, seed_grad, lane0)


def _prb_pass_lanes_bwd(n, pass_base, spp_pass, spp_total, sensor_idx, raw,
                        spp_grad, res, dL):
    """Reference render_backward (common.py:828-983): fresh primal pass at
    seed_grad -> L', pull the film adjoint back through the measurement
    conversion evaluated on the NEW lanes, then replay those same paths."""
    scene, seed_grad, lane0 = res
    from ..render_api import make_wavefront

    if spp_grad is not None and spp_grad != spp_pass:
        # refold the per-lane film adjoint to the backward lane set: under
        # mean-develop each forward lane carries A_px/spp_total, so the
        # pixel adjoint is the lane-group sum and each of the spp_grad
        # fresh lanes takes A_px/spp_grad (exact for FIS films; render()
        # gates the weighted-reconstruction filters)
        pixels = n // spp_pass
        dL_px = dL.reshape((pixels, spp_pass) + dL.shape[1:]).sum(axis=1)
        dL_px = dL_px * (spp_total / (spp_pass * spp_grad))
        dL = jnp.repeat(dL_px, spp_grad, axis=0)
        n = pixels * spp_grad
        # re-anchor a sharded chunk's first lane to the same first PIXEL
        lane0 = (lane0 // jnp.uint32(spp_pass)) * jnp.uint32(spp_grad)
        pass_base, spp_pass, spp_total = 0, spp_grad, spp_grad

    rng, ray, wavelengths, wl_pdf, _ = make_wavefront(
        scene, seed_grad, lane0, n, pass_base, spp_pass, spp_total, sensor_idx
    )
    active = jnp.ones((n,), bool)
    L_raw, _ = scene.integrator.sample(scene, rng, ray, wavelengths, active)
    L_raw = jax.lax.stop_gradient(L_raw)
    # adjoint of the (linear-in-L) measurement conversion at the new lanes
    _, pull = jax.vjp(
        lambda Lr: _postprocess(scene, Lr, ray.d, wavelengths, wl_pdf, raw), L_raw
    )
    (dL_path,) = pull(dL)
    grads = scene.integrator.sample_backward(
        scene, rng, ray, wavelengths, dL_path, L_raw, active
    )
    ct_scene = assemble_scene_cotangent(scene, grads)
    ct_seed = np.zeros((), FLOAT0)
    ct_seed_grad = np.zeros((), FLOAT0)
    ct_lane0 = np.zeros((), FLOAT0)
    return ct_scene, ct_seed, ct_seed_grad, ct_lane0


prb_pass_lanes.defvjp(_prb_pass_lanes_fwd, _prb_pass_lanes_bwd)


def derive_seed_grad(seed, seed_grad=None):
    """Default differential-phase seed: TEA hash of the primal seed
    (reference: util.py:617-619 `seed_grad = mi.sample_tea_32(seed, 1)[0]`).
    An explicit seed_grad equal to seed is rejected — correlated primal and
    differential sampling biases nonlinear-loss gradients (reference raises,
    util.py:620-622)."""
    if seed_grad is not None:
        if isinstance(seed, int) and isinstance(seed_grad, int) and seed == seed_grad:
            raise ValueError(
                "seed_grad must differ from seed: the primal and differential "
                "phases must be decorrelated (reference: util.py:620-622)"
            )
        return jnp.uint32(seed_grad)
    from ..core.rng import sample_tea_32

    return sample_tea_32(jnp.uint32(seed), jnp.uint32(1))[0]


def prb_pass(scene, seed, seed_grad, pass_base, spp_pass, spp_total, sensor_idx,
             raw=False, spp_grad=None):
    """Full-film PRB pass (all lanes of one wavefront)."""
    from ..render_api import _pass_lanes

    n = _pass_lanes(scene.film, spp_pass)
    return prb_pass_lanes(
        scene, seed, seed_grad, jnp.uint32(0), n, pass_base, spp_pass, spp_total,
        sensor_idx, raw, spp_grad,
    )


# ---------------------------------------------------------------------------
# Regenerative PRB: custom-vjp boundary for the compacted wavefront
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def prb_regen_px(scene, seed, seed_grad, spp, sensor_idx):
    """Sample-summed per-pixel radiance [n_pixels, C] under path
    regeneration, with PRB gradients.  Forward = the integrator's regen_render
    (path_regen_render / volpath_regen_render); backward = a fresh regen
    primal at seed_grad + the regenerative replay (regen_backward) —
    decorrelated per reference util.py:617-622."""
    L_px, _ = scene.integrator.regen_render(scene, seed, spp, sensor_idx)
    return L_px


def _prb_regen_px_fwd(scene, seed, seed_grad, spp, sensor_idx):
    L_px, _ = scene.integrator.regen_render(scene, seed, spp, sensor_idx)
    return L_px, (scene, seed_grad)


def _prb_regen_px_bwd(spp, sensor_idx, res, dL_px):
    scene, seed_grad = res
    _, aux = scene.integrator.regen_render(
        scene, seed_grad, spp, sensor_idx, record_samples=True
    )
    grads = scene.integrator.regen_backward(
        scene, seed_grad, spp, sensor_idx, dL_px, aux["L_samples"]
    )
    ct_scene = assemble_scene_cotangent(scene, grads)
    return ct_scene, np.zeros((), FLOAT0), np.zeros((), FLOAT0)


prb_regen_px.defvjp(_prb_regen_px_fwd, _prb_regen_px_bwd)
