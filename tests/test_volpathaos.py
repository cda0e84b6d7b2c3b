"""volpathaos tests mirroring the reference AOS suite
(reference: src/integrators/tests/test_ad_volpathaos.py: 32x32 radiancemeter
at wavelength 450, box filter, dict configs with one differentiable key;
primal max rel error < 0.5 w/ floor 2e-2 vs high-spp reference (:537-565),
backward rel error < 0.05 vs central FD eps=1e-3 (:575-618))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


SENSOR = {
    "type": "radiancemeter",
    "to_world": [
        {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
    ],
    "wavelength": 450.0,
    "film": {
        "type": "hdrfilm",
        "rfilter": {"type": "box"},
        "width": 8,
        "height": 8,
    },
    "sampler": {"type": "independent", "sample_count": 8},
}


def _diffuse_albedo_config():
    """reference: DiffuseAlbedoConfig (:121-135)."""
    return (
        {
            "type": "scene",
            "integrator": {"type": "volpathaos", "max_depth": 3},
            "plane": {
                "type": "rectangle",
                "bsdf": {"type": "diffuse", "reflectance": 0.5},
            },
            "light": {"type": "constant", "radiance": 1.0},
            "sensor": dict(SENSOR),
        },
        "plane.bsdf.reflectance.value",
    )


def _arealight_config():
    """reference: AreaLightRadianceConfig pattern."""
    return (
        {
            "type": "scene",
            "integrator": {"type": "volpathaos", "max_depth": 3},
            "plane": {"type": "rectangle", "bsdf": {"type": "diffuse", "reflectance": 0.6}},
            "light": {
                "type": "rectangle",
                "to_world": [
                    {"type": "rotate", "axis": [0, 1, 0], "angle": -180},
                    {"type": "translate", "value": [0.0, 0.0, 5.0]},
                ],
                "emitter": {"type": "area", "radiance": 3.0},
            },
            "sensor": dict(SENSOR),
        },
        "light.emitter.radiance.value",
    )


def _medium_albedo_config():
    """reference: MediumAlbedoConfig (:340-388): slab of scattering medium
    over a black floor, area light above."""
    return (
        {
            "type": "scene",
            "integrator": {"type": "volpathaos", "max_depth": 3},
            "a_medium": {
                "type": "homogeneous",
                "phase": {"type": "hg", "g": 0.5},
                "albedo": 0.5,
                "sigma_t": 1.0,
            },
            "top": {
                "type": "rectangle",
                "bsdf": {"type": "null"},
                "to_world": [
                    {"type": "scale", "value": [1000.0, 1000.0, 1.0]},
                    {"type": "translate", "value": [0.0, 0.0, 1.0]},
                ],
                "interior": {"type": "ref", "id": "a_medium"},
            },
            "bottom": {
                "type": "rectangle",
                "bsdf": {"type": "diffuse", "reflectance": 0.0},
                "to_world": [{"type": "scale", "value": [1000.0, 1000.0, 1.0]}],
                "exterior": {"type": "ref", "id": "a_medium"},
            },
            "light": {
                "type": "rectangle",
                "to_world": [
                    {"type": "rotate", "axis": [0, 1, 0], "angle": -180},
                    {"type": "translate", "value": [0.0, 0.0, 5.0]},
                ],
                "emitter": {"type": "area", "radiance": 3.0},
            },
            "sensor": dict(SENSOR),
        },
        "a_medium.albedo.value.value",
    )


def _rough_dielectric_directional_config():
    """reference: RoughDielectricRoughnessDirectionalConfig (the one enabled
    ADVANCED config, :315-338): rough dielectric ocean plane under a
    directional sun."""
    return (
        {
            "type": "scene",
            "integrator": {"type": "volpathaos", "max_depth": 3},
            "plane": {
                "type": "rectangle",
                "to_world": [{"type": "scale", "value": [1000.0, 1000.0, 1.0]}],
                "bsdf": {
                    "type": "roughdielectric",
                    "int_ior": 1.33,
                    "ext_ior": 1.0,
                    "alpha": 0.15,
                },
            },
            "emitter": {
                "type": "directional",
                "direction": [-0.5, 0, -0.866],
                "irradiance": 1.0,
            },
            "sensor": dict(SENSOR),
        },
        "plane.bsdf.alpha.value",
    )


@pytest.fixture(autouse=True)
def _variant():
    mi.set_variant("llvm_ad_mono_polarized")
    yield
    mi.set_variant("rgb")


CONFIGS = [
    ("diffuse_albedo", _diffuse_albedo_config),
    ("arealight", _arealight_config),
    ("medium_albedo", _medium_albedo_config),
]


@pytest.mark.parametrize("name,cfg", CONFIGS)
def test01_rendering_primal(name, cfg):
    """Low-spp AOS primal vs high-spp reference (reference thresholds:
    max rel err < 0.5, denominator floor 2e-2; :537-565)."""
    d, key = cfg()
    scene = mi.load_dict(d)
    ref = np.asarray(mi.render_1(scene, spp=1024, seed=0))
    img = np.asarray(mi.render_1(scene, spp=128, seed=7))
    assert np.isfinite(ref).all() and np.isfinite(img).all()
    I_ref, I = ref[0], img[0]
    assert I_ref.max() > 0, name
    err = np.abs(I - I_ref) / np.maximum(np.abs(I_ref), 2e-2)
    assert err.max() < 0.5, (name, I_ref, I)


@pytest.mark.parametrize("name,cfg", CONFIGS)
def test02_rendering_backward(name, cfg):
    """Tape-mode gradient of render_1 (unit adjoint on I) vs central FD
    (reference thresholds: rel err < 0.05, eps = 1e-3; :575-618)."""
    d, key = cfg()
    scene = mi.load_dict(d)
    path = [p for k, p in scene.param_paths if k == key][0]
    base = _tree_get(scene, path)
    spp, seed = 192, 3

    def f(t):
        s2 = _tree_set(scene, path, base + t * jnp.ones_like(base))
        out = mi.render_1(s2, spp=spp, seed=seed)
        return jnp.sum(out[0])   # unit adjoint on the I component

    eps = 1e-3
    fd = (f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps)
    ad = jax.grad(lambda t: f(t))(jnp.asarray(0.0))
    rel = abs(float(ad) - float(fd)) / max(abs(float(fd)), 1e-3)
    assert float(fd) != 0.0, name
    assert rel < 0.05, (name, float(fd), float(ad), rel)


def test03_volpathaos_matches_volpath_no_interface():
    """On scenes without a refractive interface, volpathaos and volpath are
    estimators of the same integral."""
    d, _ = _medium_albedo_config()
    s_aos = mi.load_dict(d)
    a = np.asarray(mi.render_1(s_aos, spp=1024, seed=1))
    d["integrator"] = {"type": "volpath", "max_depth": 3}
    s_vol = mi.load_dict(d)
    b = np.asarray(mi.render_1(s_vol, spp=1024, seed=2))
    np.testing.assert_allclose(a[0], b[0], rtol=0.03)


def test04_refractive_nee_underwater():
    """The refractive-NEE scheme: an underwater diffuse floor lit by the sun
    through a rough ocean surface must receive light via NEE (without the
    refraction proposal the Dirac sun would be unreachable from below)."""
    d = {
        "type": "scene",
        "integrator": {"type": "volpathaos", "max_depth": 4},
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
        "sun": {"type": "directional", "direction": [-0.3, 0, -0.954], "irradiance": 5.0},
        "sensor": dict(SENSOR),
    }
    # camera above water looking down at the floor through the surface
    scene = mi.load_dict(d)
    spec = np.asarray(mi.render_1(scene, spp=512, seed=0))
    I = spec[0, 0]
    assert np.isfinite(spec).all()
    assert I > 1e-3, spec   # light reaches the camera through the interface
