"""AOS PRB replay (prb_volpathaos): primal parity with volpathaos and
replay gradients vs FD through the refractive interface
(reference: prb_volpathaos.py + test_ad_volpathaos.py thresholds)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _mono():
    mi.set_variant("mono")
    yield
    mi.set_variant("rgb")


def _ocean_scene(integrator="prb_volpathaos", with_atmo=False):
    d = {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 4},
        "ocean_surface": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": [1000.0, 1000.0, 1.0]}],
            "bsdf": {
                "type": "roughdielectric",
                "int_ior": 1.33, "ext_ior": 1.0, "alpha": 0.2,
            },
        },
        "sea_floor": {
            "type": "rectangle",
            "to_world": [
                {"type": "scale", "value": [1000.0, 1000.0, 1.0]},
                {"type": "translate", "value": [0.0, 0.0, -2.0]},
            ],
            "bsdf": {"type": "diffuse", "reflectance": 0.5},
        },
        "sun": {"type": "directional", "direction": [-0.3, 0, -0.954],
                "irradiance": 5.0},
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0],
                 "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "rfilter": {"type": "box"},
                     "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 8},
        },
    }
    if with_atmo:
        d["atmo_medium"] = {
            "type": "homogeneous",
            "phase": {"type": "rayleigh"},
            "albedo": 0.8,
            "sigma_t": 0.2,
        }
        d["atmo"] = {
            "type": "cube", "bsdf": {"type": "null"},
            "to_world": [
                {"type": "scale", "value": [1000.0, 1000.0, 0.4]},
                {"type": "translate", "value": [0.0, 0.0, 1.0]},
            ],
            "interior": {"type": "ref", "id": "atmo_medium"},
        }
    return d


def test_primal_matches_volpathaos():
    s_prb = mi.load_dict(_ocean_scene("prb_volpathaos"))
    assert getattr(s_prb.integrator, "is_prb", False)
    s_aos = mi.load_dict(_ocean_scene("volpathaos"))
    a = np.asarray(mi.render_1(s_prb, spp=256, seed=7))
    b = np.asarray(mi.render_1(s_aos, spp=256, seed=7))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert a[0] > 1e-3    # light reaches the camera through the interface


def _fd_and_prb(scene_dict, key, spp=512, seed=3, eps=1e-3):
    scene = mi.load_dict(scene_dict)
    path = [p for k, p in scene.param_paths if k == key][0]
    base = _tree_get(scene, path)

    def f(t):
        s2 = _tree_set(scene, path, base + t * jnp.ones_like(base))
        return jnp.sum(mi.render_1(s2, spp=spp, seed=seed))

    fd = float((f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps))
    ad = float(jax.grad(f)(jnp.asarray(0.0)))
    return fd, ad


def test_grad_seafloor_reflectance_through_interface():
    """d(measurement)/d(sea-floor albedo): the light path crosses the rough
    ocean surface twice and the NEE leg uses the refraction proposal — the
    replay's attached AOS shadow walk must carry this gradient."""
    fd, ad = _fd_and_prb(_ocean_scene(), "sea_floor.bsdf.reflectance.value")
    assert fd > 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (fd, ad, rel)


def test_grad_sun_irradiance():
    fd, ad = _fd_and_prb(_ocean_scene(), "sun.irradiance.value")
    assert fd > 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (fd, ad, rel)


def test_grad_atmosphere_albedo_above_ocean():
    """Medium albedo of a Rayleigh atmosphere over the ocean (the NASA
    retrieval configuration)."""
    fd, ad = _fd_and_prb(
        _ocean_scene(with_atmo=True), "atmo_medium.albedo.value.value"
    )
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (fd, ad, rel)


def test_polarized_aos_grad():
    """prb_volpathaos in mono_polarized: Mueller-chain replay through the
    refractive interface; intensity gradient vs FD."""
    mi.set_variant("mono_polarized")
    fd, ad = _fd_and_prb(
        _ocean_scene(with_atmo=True), "atmo_medium.albedo.value.value", spp=512
    )
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.08, (fd, ad, rel)
