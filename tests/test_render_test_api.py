"""render_test multi-view batch reduction (reference: mi.render_test,
common.py:198-302): split a wide film into sensor_count sub-views and
average each to a (Stokes x channel) measurement."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


def _two_view_scene(polarized=False):
    # 64x32 film = two 32x32 sub-views; a batch sensor points one view at a
    # red-lit wall and the other at a green-lit wall.
    wall = lambda x, refl: {
        "type": "rectangle",
        "to_world": [
            {"type": "scale", "value": 40.0},
            {"type": "translate", "value": [x, 0, -2]},
        ],
        "bsdf": {"type": "diffuse", "reflectance": refl},
    }
    cam = lambda x: {
        "type": "perspective", "fov": 20,
        "to_world": {"type": "lookat", "origin": [x, 0, 0],
                      "target": [x, 0, -2], "up": [0, 1, 0]},
    }
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "left_wall": wall(-100.0, [0.8, 0.1, 0.1]),
        "right_wall": wall(+100.0, [0.1, 0.8, 0.1]),
        "light": {"type": "constant", "radiance": 1.0},
        "sensor": {
            "type": "batch",
            "cam0": cam(-100.0),
            "cam1": cam(+100.0),
            "film": {"type": "hdrfilm", "width": 64, "height": 32},
        },
    }


def test_render_test_two_views():
    mi.set_variant("rgb")
    scene = mi.load_dict(_two_view_scene())
    out = np.asarray(mi.render_test(scene, spp=16, seed=0, sensor_count=2))
    assert out.shape == (2, 3)
    # view 0 sees the red wall, view 1 the green wall
    assert out[0, 0] > 2.0 * out[0, 1], out
    assert out[1, 1] > 2.0 * out[1, 0], out
    # each view average equals the film-region average of a full render
    img = np.asarray(mi.render(scene, spp=16, seed=0))
    np.testing.assert_allclose(out[0], img[:, :32].mean(axis=(0, 1)), rtol=0.35)
    np.testing.assert_allclose(out[1], img[:, 32:].mean(axis=(0, 1)), rtol=0.35)


def test_render_test_polarized_shape():
    mi.set_variant("mono_polarized")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 16
    d["integrator"] = {"type": "volpath", "max_depth": 3}
    scene = mi.load_dict(d)
    out = np.asarray(mi.render_test(scene, spp=4, seed=0, sensor_count=2))
    assert out.shape == (2, 4, 1)
    assert np.isfinite(out).all()
    assert (out[:, 0] > 0).all()          # intensity positive
    # matches render_1 when averaged over views up to sub-view layout
    one = np.asarray(mi.render_1(scene, spp=4, seed=0))
    np.testing.assert_allclose(out.mean(axis=0), one, rtol=1e-4, atol=1e-6)
