"""End-to-end rendering tests: analytic ground truths + consistency checks
(mirrors the role of reference src/render/tests/test_renders.py golden images,
with in-process analytic references instead of stored EXRs)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_furnace_white_sphere():
    """A perfectly white diffuse sphere in a uniform unit environment must
    render exactly 1 everywhere (convex object, energy conservation)."""
    scene = mi.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 32, "rr_depth": 64},
            "sensor": {
                "type": "perspective",
                "fov": 40,
                "to_world": [
                    {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
                ],
                "film": {"type": "hdrfilm", "width": 32, "height": 32, "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 32},
            },
            "sph": {"type": "sphere", "radius": 1.0, "bsdf": {"type": "diffuse", "reflectance": 1.0}},
            "env": {"type": "constant", "radiance": 1.0},
        }
    )
    img = np.asarray(mi.render(scene, spp=128))
    assert not np.isnan(img).any()
    np.testing.assert_allclose(img, 1.0, atol=0.08)      # per-pixel MC noise
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.005)  # unbiasedness


def test_furnace_gray_sphere_single_bounce():
    """Albedo-0.5 sphere, max_depth=2 (one bounce): center pixel = 0.5."""
    scene = mi.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2, "rr_depth": 64},
            "sensor": {
                "type": "perspective",
                "fov": 10,
                "to_world": [
                    {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
                ],
                "film": {"type": "hdrfilm", "width": 16, "height": 16, "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 256},
            },
            "sph": {"type": "sphere", "radius": 1.0, "bsdf": {"type": "diffuse", "reflectance": 0.5}},
            "env": {"type": "constant", "radiance": 1.0},
        }
    )
    img = np.asarray(mi.render(scene, spp=256))
    # every camera ray hits the sphere (fov 10 deg, sphere subtends more)
    np.testing.assert_allclose(img, 0.5, atol=0.04)      # per-pixel MC noise
    np.testing.assert_allclose(img.mean(), 0.5, atol=0.003)


def test_point_light_analytic():
    """Point light above a diffuse plane: L = albedo * I * cos0 / (pi d^2)."""
    albedo = 0.7
    intensity = 10.0
    h = 2.0
    scene = mi.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective",
                "fov": 5,
                "to_world": [
                    {"type": "look_at", "origin": [0, 1.5, 0], "target": [0, 0, 0], "up": [0, 0, 1]}
                ],
                "film": {"type": "hdrfilm", "width": 8, "height": 8, "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 64},
            },
            "plane": {
                "type": "rectangle",
                "to_world": [
                    {"type": "rotate", "axis": [1, 0, 0], "angle": -90},
                    {"type": "scale", "value": 10.0},
                ],
                "bsdf": {"type": "diffuse", "reflectance": albedo},
            },
            "light": {"type": "point", "position": [0, h, 0], "intensity": intensity},
        }
    )
    # plane rotated: rectangle z=0 plane rotated -90 about x -> y=0 plane, normal +y
    img = np.asarray(mi.render(scene, spp=512))
    expected = albedo * intensity / (np.pi * h * h)
    np.testing.assert_allclose(img.mean(axis=(0, 1)), expected, rtol=0.03)


def test_render_deterministic():
    scene = mi.load_dict(_small_cbox())
    a = np.asarray(mi.render(scene, spp=8, seed=5))
    b = np.asarray(mi.render(scene, spp=8, seed=5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(mi.render(scene, spp=8, seed=6))
    assert not np.array_equal(a, c)


def test_render_pass_split_invariance():
    """spp split into passes must give the same estimate distribution;
    with global-sample RNG keying it is bitwise identical."""
    scene = mi.load_dict(_small_cbox())
    a = np.asarray(mi.render(scene, spp=16, seed=3))
    b = np.asarray(mi.render(scene, spp=16, seed=3, spp_per_pass=4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_cornell_box_statistics():
    scene = mi.load_dict(_small_cbox())
    img = np.asarray(mi.render(scene, spp=64))
    assert not np.isnan(img).any()
    assert (img >= 0).all()
    # red wall on the left, green on the right (camera looks -z from +z)
    left = img[28:36, 2:8]
    right = img[28:36, -8:-2]
    assert left[..., 0].mean() > left[..., 1].mean()   # red dominant
    assert right[..., 1].mean() > right[..., 0].mean()  # green dominant
    # light is the brightest region
    assert img.max() > 5.0


def test_direct_vs_path_on_direct_scene():
    """With max_depth=2, path == direct illumination only; the `direct`
    integrator must agree (MIS consistency check)."""
    d = _small_cbox()
    d["integrator"] = {"type": "path", "max_depth": 2}
    s1 = mi.load_dict(d)
    img1 = np.asarray(mi.render(s1, spp=256, seed=1))
    d["integrator"] = {"type": "direct"}
    s2 = mi.load_dict(d)
    img2 = np.asarray(mi.render(s2, spp=256, seed=2))
    err = np.abs(img1 - img2).mean() / max(img1.mean(), 1e-6)
    assert err < 0.05, err


def _small_cbox():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 48
    d["sensor"]["film"]["height"] = 48
    return d
