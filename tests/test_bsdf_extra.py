"""mask / blendbsdf / polarizer / retarder plugins
(reference: src/bsdfs/{mask,blendbsdf,polarizer,retarder}.cpp)."""
import numpy as np
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _reset():
    yield
    mi.set_variant("rgb")


def _screen_scene(bsdf, integrator="path"):
    """Camera at -5x looking +x; a screen rectangle at x=0 with `bsdf`;
    constant unit environment behind everything."""
    return {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 4},
        "env": {"type": "constant", "radiance": 1.0},
        "screen": {
            "type": "rectangle",
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 0], "target": [-1, 0, 0], "up": [0, 0, 1]},
                {"type": "scale", "value": 50.0},
            ],
            "bsdf": bsdf,
        },
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [-5, 0, 0], "target": [0, 0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 1, "height": 1,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
    }


def test_mask_transmits_one_minus_opacity():
    mi.set_variant("mono")
    for op in (0.0, 0.3, 1.0):
        d = _screen_scene({
            "type": "mask",
            "opacity": op,
            "bsdf": {"type": "diffuse", "reflectance": 0.0},
        })
        scene = mi.load_dict(d)
        img = np.asarray(mi.render(scene, spp=512, seed=3))
        # black diffuse nested lobe: only the pass-through path carries light
        np.testing.assert_allclose(img.mean(), 1.0 - op, atol=0.05)


def test_blendbsdf_matches_equivalent_diffuse():
    mi.set_variant("mono")

    def plane_scene(bsdf):
        return {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sun": {"type": "directional", "direction": [0, 0, -1], "irradiance": 2.0},
            "floor": {
                "type": "rectangle",
                "to_world": [{"type": "scale", "value": 50.0}],
                "bsdf": bsdf,
            },
            "sensor": {
                "type": "radiancemeter",
                "to_world": [
                    {"type": "look_at", "origin": [0, 0, 5], "target": [0, 0, 0], "up": [0, 1, 0]}
                ],
                "film": {"type": "hdrfilm", "width": 1, "height": 1,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 16},
            },
        }

    blend = plane_scene({
        "type": "blendbsdf",
        "weight": 0.25,
        "a": {"type": "diffuse", "reflectance": 0.2},
        "b": {"type": "diffuse", "reflectance": 0.8},
    })
    plain = plane_scene({"type": "diffuse", "reflectance": 0.25 * 0.8 + 0.75 * 0.2})
    a = np.asarray(mi.render(mi.load_dict(blend), spp=1024, seed=5)).mean()
    b = np.asarray(mi.render(mi.load_dict(plain), spp=1024, seed=5)).mean()
    np.testing.assert_allclose(a, b, rtol=0.03)


def test_polarizer_halves_and_fully_polarizes():
    mi.set_variant("mono_polarized")
    d = _screen_scene({"type": "polarizer", "theta": 30.0})
    scene = mi.load_dict(d)
    spec = np.asarray(mi.render_1(scene, spp=256))   # [4, 1]
    I, Q, U, V = spec[:, 0]
    # ideal polarizer passes half the unpolarized env radiance, fully
    # linearly polarized (reference: polarizer.cpp)
    np.testing.assert_allclose(I, 0.5, atol=0.03)
    dolp = np.sqrt(Q**2 + U**2) / I
    np.testing.assert_allclose(dolp, 1.0, atol=0.02)
    assert abs(V) / I < 0.02


def test_retarder_preserves_unpolarized_intensity():
    mi.set_variant("mono_polarized")
    d = _screen_scene({"type": "retarder", "theta": 0.0, "delta": 90.0})
    scene = mi.load_dict(d)
    spec = np.asarray(mi.render_1(scene, spp=256))
    I, Q, U, V = spec[:, 0]
    # a wave plate does not attenuate or polarize unpolarized light
    np.testing.assert_allclose(I, 1.0, atol=0.03)
    assert np.sqrt(Q**2 + U**2 + V**2) / I < 0.03


def test_mask_scene_loads_in_rgb_path():
    mi.set_variant("rgb")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["white"] = {
        "type": "mask",
        "opacity": 0.8,
        "bsdf": {"type": "diffuse", "reflectance": [0.7, 0.7, 0.7]},
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=1))
    assert np.isfinite(img).all() and img.max() > 0


def test_normalmap_tilts_shading():
    """A constant normal map tilting normals by ~31 deg off +z must change a
    directionally-lit diffuse plane like the equivalent tilted plane:
    L = albedo/pi * cos(tilt) * E for light along -z."""
    mi.set_variant("mono")

    def plane(bsdf):
        return {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sun": {"type": "directional", "direction": [0, 0, -1], "irradiance": 1.0},
            "floor": {
                "type": "rectangle",
                "to_world": [{"type": "scale", "value": 50.0}],
                "bsdf": bsdf,
            },
            "sensor": {
                "type": "radiancemeter",
                "to_world": [
                    {"type": "look_at", "origin": [0, 0, 5], "target": [0, 0, 0], "up": [0, 1, 0]}
                ],
                "film": {"type": "hdrfilm", "width": 1, "height": 1,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 16},
            },
        }

    import numpy as np
    tilt = np.deg2rad(31.0)
    n = [np.sin(tilt), 0.0, np.cos(tilt)]
    enc = [(v + 1.0) * 0.5 for v in n]
    d = plane({
        "type": "normalmap",
        "normalmap": enc,
        "bsdf": {"type": "diffuse", "reflectance": 0.6},
    })
    img = np.asarray(mi.render(mi.load_dict(d), spp=512, seed=2)).mean()
    expect = 0.6 / np.pi * np.cos(tilt)
    np.testing.assert_allclose(img, expect, rtol=0.04)

    flat = plane({
        "type": "normalmap",
        "normalmap": [0.5, 0.5, 1.0],
        "bsdf": {"type": "diffuse", "reflectance": 0.6},
    })
    img_flat = np.asarray(mi.render(mi.load_dict(flat), spp=512, seed=2)).mean()
    np.testing.assert_allclose(img_flat, 0.6 / np.pi, rtol=0.04)


def test_pplastic_polarizes_at_glancing():
    """pplastic's specular lobe carries the polarized Fresnel: near-Brewster
    reflection off the plastic coat is strongly linearly polarized while the
    diffuse base depolarizes (reference: src/bsdfs/pplastic.cpp)."""
    import numpy as np
    mi.set_variant("mono_polarized")
    brewster = np.degrees(np.arctan(1.49))
    h = 3.0
    x = h * np.tan(np.radians(brewster))
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sun": {"type": "directional",
                "direction": [float(np.sin(np.radians(brewster))), 0.0,
                              float(-np.cos(np.radians(brewster)))],
                "irradiance": 5.0},
        "floor": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 50.0}],
            "bsdf": {"type": "pplastic", "diffuse_reflectance": 0.05,
                     "alpha": 0.08},
        },
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [x, 0, h], "target": [0, 0, 0],
                 "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 1, "height": 1,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
    }
    spec = np.asarray(mi.render_1(mi.load_dict(d), spp=2048))
    I, Q, U, V = spec[:, 0]
    assert I > 0
    dolp = np.hypot(Q, U) / I
    # specular near Brewster is ~fully polarized; the small diffuse term
    # and lobe roughness wash out some of it
    assert dolp > 0.6, (I, Q, U, V, dolp)

    # unpolarized magnitudes must match roughplastic exactly
    mi.set_variant("mono")
    d["floor"]["bsdf"] = {"type": "pplastic", "diffuse_reflectance": 0.3, "alpha": 0.1}
    a = np.asarray(mi.render_1(mi.load_dict(d), spp=512, seed=3))
    d["floor"]["bsdf"] = {"type": "roughplastic", "diffuse_reflectance": 0.3, "alpha": 0.1}
    b = np.asarray(mi.render_1(mi.load_dict(d), spp=512, seed=3))
    np.testing.assert_allclose(a, b, rtol=1e-4)
