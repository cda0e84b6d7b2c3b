"""Volumetric transport tests: analytic absorption, scattering-furnace
equilibrium (the volumetric analog of golden-image tests; reference test
strategy: src/integrators/tests/)."""
import numpy as np
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _medium_cube_scene(medium, spp=64, max_depth=16, fov=10, albedo_light=1.0):
    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": max_depth, "rr_depth": 64},
        "sensor": {
            "type": "perspective",
            "fov": fov,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 6], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 16, "height": 16, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "medium1": medium,
        "bounds": {
            "type": "cube",
            "bsdf": {"type": "null"},
            "interior": {"type": "ref", "id": "medium1"},
        },
        "env": {"type": "constant", "radiance": albedo_light},
    }


def test_pure_absorption_analytic():
    """Absorbing-only homogeneous medium in a [-1,1]^3 cube: the central
    camera ray sees exp(-2 sigma_t)."""
    sigma_t = 0.8
    d = _medium_cube_scene(
        {
            "type": "homogeneous",
            "sigma_t": sigma_t,
            "albedo": 0.0,
            "phase": {"type": "isotropic"},
        },
        spp=64,
        fov=3,
    )
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=64))
    expected = np.exp(-2.0 * sigma_t)
    np.testing.assert_allclose(img.mean(axis=(0, 1)), expected, rtol=0.02)


def test_scattering_furnace_homogeneous():
    """Albedo-1 scattering medium in a uniform unit radiance field is in
    equilibrium: every pixel must be 1 (exercises delta tracking, null
    interfaces, NEE ratio tracking, and phase MIS end-to-end)."""
    d = _medium_cube_scene(
        {
            "type": "homogeneous",
            "sigma_t": 1.0,
            "albedo": 1.0,
            "phase": {"type": "isotropic"},
        },
        spp=128,
        max_depth=64,
        fov=10,
    )
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=128))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.015)
    np.testing.assert_allclose(img, 1.0, atol=0.15)


def test_scattering_furnace_hg():
    """Same furnace with forward HG phase (g=0.7)."""
    d = _medium_cube_scene(
        {
            "type": "homogeneous",
            "sigma_t": 1.0,
            "albedo": 1.0,
            "phase": {"type": "hg", "g": 0.7},
        },
        spp=128,
        max_depth=64,
    )
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=128))
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.02)


def test_scattering_furnace_heterogeneous():
    """Furnace with a spatially-varying sigma_t grid (delta tracking must be
    unbiased for any density field under the constant majorant)."""
    rng = np.random.default_rng(0)
    grid = (0.2 + 1.3 * rng.random((8, 8, 8, 1))).astype(np.float32)
    d = _medium_cube_scene(
        {
            "type": "heterogeneous",
            "sigma_t": {
                "type": "gridvolume",
                "data": grid,
                "bbox_min": [-1, -1, -1],
                "bbox_max": [1, 1, 1],
            },
            "albedo": 1.0,
            "phase": {"type": "isotropic"},
        },
        spp=128,
        max_depth=64,
    )
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=128))
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.02)


def test_volpath_matches_path_without_media():
    """On a pure-surface scene, volpath must agree with path."""
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    d["integrator"] = {"type": "path", "max_depth": 4}
    img_path = np.asarray(mi.render(mi.load_dict(d), spp=256, seed=1))
    d["integrator"] = {"type": "volpath", "max_depth": 4}
    img_vol = np.asarray(mi.render(mi.load_dict(d), spp=256, seed=2))
    # independent MC estimates: pixels agree to noise, means to ~3 sigma
    err = np.abs(img_path - img_vol).mean() / img_path.mean()
    assert err < 0.10, err
    mean_err = abs(img_path.mean() - img_vol.mean()) / img_path.mean()
    assert mean_err < 0.015, mean_err


def test_absorbing_shadow():
    """A light behind an absorbing slab: NEE transmittance (ratio tracking)
    must attenuate by exp(-optical depth)."""
    sigma_t = 1.0
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 2,
            "to_world": [
                # straight down from just under the slab: tiny, uniform
                # footprint so the analytic center value applies
                {"type": "look_at", "origin": [0, 0.5, 0.0], "target": [0, 0.0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 8, "height": 8, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 256},
        },
        "medium1": {
            "type": "homogeneous",
            "sigma_t": sigma_t,
            "albedo": 0.0,
            "phase": {"type": "isotropic"},
        },
        # absorbing box hovering between plane and light, z in [-1,1]
        "slab": {
            "type": "cube",
            "to_world": [
                {"type": "scale", "value": [10.0, 0.25, 10.0]},
                {"type": "translate", "value": [0.0, 1.0, 0.0]},
            ],
            "bsdf": {"type": "null"},
            "interior": {"type": "ref", "id": "medium1"},
        },
        "plane": {
            "type": "rectangle",
            "to_world": [
                {"type": "rotate", "axis": [1, 0, 0], "angle": -90},
                {"type": "scale", "value": 4.0},
            ],
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
        "light": {"type": "point", "position": [0, 3.0, 0], "intensity": 20.0},
    }
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=256)).mean(axis=(0, 1))
    # direct illumination through the slab (vertical thickness 0.5):
    # L = rho * I * cos / (pi d^2) * exp(-sigma_t * 0.5) at the center point
    expected = 0.8 * 20.0 / (np.pi * 3.0**2) * np.exp(-sigma_t * 0.5)
    np.testing.assert_allclose(img, expected, rtol=0.06)
