"""volume (3D texture slice) and mesh_attribute textures
(reference: src/textures/{volume,mesh_attribute}.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _base(floor_bsdf):
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "floor": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 2.0}],
            "bsdf": floor_bsdf,
        },
        "light": {"type": "constant", "radiance": 1.0},
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": {"type": "lookat", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"type": "hdrfilm", "width": 32, "height": 32},
        },
    }


def test_volume_texture_slices_grid():
    """A gridded 3D albedo sliced by the z=0 plane: left half red, right
    half green (grid varies along world x)."""
    grid = np.zeros((2, 2, 2, 3), np.float32)
    grid[..., 0, :] = [0.8, 0.1, 0.1]     # x-low: red
    grid[..., 1, :] = [0.1, 0.8, 0.1]     # x-high: green
    bsdf = {
        "type": "diffuse",
        "reflectance": {
            "type": "volume",
            "volume": {"type": "gridvolume", "data": grid,
                        "bbox_min": [-2, -2, -1], "bbox_max": [2, 2, 1]},
        },
    }
    img = np.asarray(mi.render(mi.load_dict(_base(bsdf)), spp=16, seed=0))
    left = img[:, :12]
    right = img[:, 20:]
    assert left[..., 0].mean() > 1.5 * left[..., 1].mean(), left.mean(axis=(0, 1))
    assert right[..., 1].mean() > 1.5 * right[..., 0].mean(), right.mean(axis=(0, 1))


def test_volume_texture_const_matches_constant():
    bsdf_v = {"type": "diffuse",
              "reflectance": {"type": "volume",
                               "volume": {"type": "constvolume",
                                           "value": [0.3, 0.5, 0.7]}}}
    bsdf_c = {"type": "diffuse", "reflectance": [0.3, 0.5, 0.7]}
    a = np.asarray(mi.render(mi.load_dict(_base(bsdf_v)), spp=16, seed=0))
    b = np.asarray(mi.render(mi.load_dict(_base(bsdf_c)), spp=16, seed=0))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mesh_attribute_vertex_colors():
    """Per-vertex colors interpolated across a quad: corners keep their
    colors, the center blends."""
    # rectangle vertices (make_rectangle order): (-1,-1),(1,-1),(1,1),(-1,1)
    colors = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32
    )
    bsdf = {"type": "diffuse",
            "reflectance": {"type": "mesh_attribute", "name": "vertex_color"}}
    d = _base(bsdf)
    d["floor"]["attributes"] = {"vertex_color": colors}
    img = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=0))
    assert np.isfinite(img).all()
    # image y is flipped vs world y for this camera: bottom rows = world -y
    bl = img[26:30, 2:6].mean(axis=(0, 1))     # world (-1,-1): red
    br = img[26:30, 26:30].mean(axis=(0, 1))   # world (1,-1): green
    tr = img[2:6, 26:30].mean(axis=(0, 1))     # world (1,1): blue
    tl = img[2:6, 2:6].mean(axis=(0, 1))       # world (-1,1): yellow
    assert bl[0] > 2 * max(bl[1], bl[2]), bl
    assert br[1] > 2 * max(br[0], br[2]), br
    assert tr[2] > 2 * max(tr[0], tr[1]), tr
    assert tl[0] > 2 * tl[2] and tl[1] > 2 * tl[2], tl


def test_mesh_attribute_missing_raises():
    bsdf = {"type": "diffuse",
            "reflectance": {"type": "mesh_attribute", "name": "nope"}}
    with pytest.raises(ValueError):
        mi.load_dict(_base(bsdf))
