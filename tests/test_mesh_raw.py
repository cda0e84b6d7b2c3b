"""Programmatic raw-array meshes ({'type': 'mesh'} / 'blender' alias) —
the reference's Python-constructed mi.Mesh / Blender-bridge workflow
(reference: src/shapes/blender.cpp, mesh.cpp programmatic constructor)."""
import numpy as np
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _quad_spec(**kw):
    return dict(
        {
            "type": "mesh",
            "vertex_positions": [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
            "faces": [[0, 1, 2], [0, 2, 3]],
        },
        **kw,
    )


def test_mesh_raw_matches_rectangle():
    """A raw quad must render identically to the built-in rectangle."""
    def scene(shape):
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2},
            "sensor": {
                "type": "perspective", "fov": 45,
                "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                              "target": [0, 0, 0], "up": [0, 1, 0]}],
                "film": {"type": "hdrfilm", "width": 16, "height": 16,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 4},
            },
            "light": {"type": "point", "position": [0, 0, 3],
                      "intensity": {"type": "rgb", "value": [10, 10, 10]}},
            "plate": dict(shape, bsdf={"type": "diffuse", "reflectance": 0.5}),
        })

    img_rect = np.asarray(mi.render(scene({"type": "rectangle"}), spp=16, seed=0))
    img_mesh = np.asarray(mi.render(scene(_quad_spec()), spp=16, seed=0))
    np.testing.assert_allclose(img_mesh, img_rect, rtol=1e-5, atol=1e-6)


def test_mesh_raw_to_world_and_params():
    """to_world applies; vertex_positions are exposed via traverse for
    inverse-geometry workflows."""
    spec = _quad_spec(to_world=[{"type": "translate", "value": [0.5, 0.0, 0.0]}])
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "light": {"type": "constant", "radiance": {"type": "rgb", "value": [1, 1, 1]}},
        "plate": dict(spec, bsdf={"type": "diffuse", "reflectance": 0.5}),
    })
    p = mi.traverse(scene)
    keys = [k for k in p.keys() if "vertex_positions" in k]
    assert keys, list(p.keys())[:20]
    v = np.asarray(p[keys[0]]).reshape(-1, 3)
    assert abs(v[:, 0].mean() - 0.5) < 1e-6  # translation applied


def test_mesh_raw_blender_alias_and_normals():
    spec = {
        "type": "blender",
        "vertex_positions": np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
        ),
        "faces": np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        "vertex_normals": np.tile(np.array([0, 0, 1], np.float32), (4, 1)),
        "vertex_texcoords": np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
    }
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "light": {"type": "constant", "radiance": {"type": "rgb", "value": [1, 1, 1]}},
        "plate": dict(spec, bsdf={"type": "diffuse", "reflectance": 0.5}),
    })
    img = np.asarray(mi.render(scene, spp=8, seed=0))
    assert np.isfinite(img).all() and img.max() > 0
