"""Polarized projective gradients (VERDICT r4 item 3): prb_projective in a
mono_polarized variant, FD-validated on BOTH the I and Q image components of
a moving-silhouette configuration (reference: PSIntegrator is
variant-generic; the curve integrand dL is a Stokes vector)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _pol():
    mi.set_variant("mono_polarized")
    yield
    mi.set_variant("rgb")


def _scene():
    """Unpolarized emissive background; the occluding foreground panel is a
    linear POLARIZER, so the transmitted region carries Q != 0 while the
    unoccluded region is unpolarized — translating/scaling the panel moves a
    silhouette across which BOTH I and Q jump."""
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "prb_projective", "max_depth": 4,
                       "sppp": 24, "sppi": 0},
        "sensor": {
            "type": "perspective",
            "fov": 40.0,
            "to_world": {"type": "look_at", "origin": [0, 0, 4],
                         "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"type": "hdrfilm", "width": 20, "height": 20,
                     "rfilter": {"type": "box"}},
        },
        "bg": {
            "type": "rectangle",
            "to_world": mi.Transform.translate([0, 0, -1]) @ mi.Transform.scale([6, 6, 1]),
            "emitter": {"type": "area", "radiance": 1.0},
        },
        "occluder": {
            "type": "rectangle",
            "to_world": mi.Transform.translate([0.3, 0.0, 1.0]) @ mi.Transform.scale([0.6, 0.6, 1]),
            "bsdf": {"type": "polarizer", "theta": 0.0},
        },
    })


def test_prb_projective_polarized_silhouette_I_and_Q():
    scene = _scene()
    img = np.asarray(mi.render(scene, spp=32, seed=3))
    assert img.shape == (20, 20, 4, 1)
    assert np.isfinite(img).all()
    # the polarizer region really carries Q (transmitted light is polarized)
    assert np.abs(img[:, :, 1]).max() > 0.05 * img[:, :, 0].max()

    path = dict(scene.param_paths)["occluder.vertex_positions"]
    base = _tree_get(scene, path)
    center = jnp.mean(base, axis=0, keepdims=True)
    off = base - center

    def loss_I(t, spp, seed):
        s2 = _tree_set(scene, path, base + t * off)
        return jnp.sum(mi.render(s2, spp=spp, seed=seed)[:, :, 0])

    def loss_Q2(t, spp, seed):
        # sum(Q) nearly cancels over the film (the per-pixel sensor Stokes
        # basis twists across the image), so differentiate sum(Q^2): its
        # adjoint (2Q on the Q row) exercises the full Stokes curve
        # contraction with a non-degenerate FD target
        s2 = _tree_set(scene, path, base + t * off)
        img = mi.render(s2, spp=spp, seed=seed)
        return jnp.sum(img[:, :, 1] ** 2)

    eps = 1e-2
    # tolerances carry headroom over the measured errors (I ~4%, Q^2 ~3%):
    # XLA CPU reduction order varies with the worker thread count, so under
    # a loaded -n 8 suite the MC estimates shift a few percent
    for name, loss, tol, seeds in (
        ("I", loss_I, 0.2, (7, 11)),
        ("Q^2", loss_Q2, 0.35, (7, 11, 13)),
    ):
        fd = float((loss(jnp.asarray(eps), 512, 7)
                    - loss(jnp.asarray(-eps), 512, 7)) / (2 * eps))
        ad = float(np.mean([
            jax.grad(lambda t: loss(t, 64, sd))(jnp.asarray(0.0))
            for sd in seeds
        ]))
        assert abs(fd) > 0.5, (name, fd)
        assert abs(ad - fd) < tol * abs(fd), (name, ad, fd)


def test_direct_projective_rejects_polarized():
    d = {
        "type": "scene",
        "integrator": {"type": "direct_projective"},
        "sensor": {"type": "perspective",
                   "film": {"type": "hdrfilm", "width": 8, "height": 8}},
        "obj": {"type": "rectangle"},
    }
    with pytest.raises(ValueError):
        mi.load_dict(d)
