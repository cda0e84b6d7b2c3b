"""SDF grid shape (reference: src/shapes/sdfgrid.cpp): sphere-traced signed
distance field with differentiable grid values."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.shapes import sdf_trilerp, sdf_gradient


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _sphere_sdf(n=48, radius=0.3):
    g = np.linspace(0.0, 1.0, n, dtype=np.float32)
    Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2) - radius


def _scene(grid, to_world=None):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sdf": {"type": "sdfgrid", "data": grid,
                "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.3, 0.2]}},
        "light": {"type": "constant", "radiance": 1.0},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": {"type": "lookat", "origin": [0.5, 0.5, 3.0],
                          "target": [0.5, 0.5, 0.5], "up": [0, 1, 0]},
            "film": {"type": "hdrfilm", "width": 32, "height": 32},
        },
    }
    if to_world is not None:
        d["sdf"]["to_world"] = to_world
    return d


def test_trilerp_and_gradient():
    grid = _sphere_sdf(32, 0.25)
    p = jnp.asarray([[0.5, 0.5, 0.9], [0.5, 0.5, 0.75], [0.2, 0.5, 0.5]])
    f = np.asarray(sdf_trilerp(jnp.asarray(grid), p))
    np.testing.assert_allclose(f, [0.15, 0.0, 0.05], atol=5e-3)
    g = np.array(sdf_gradient(jnp.asarray(grid), p))
    g = g / np.linalg.norm(g, axis=-1, keepdims=True)
    np.testing.assert_allclose(g[0], [0, 0, 1], atol=2e-2)
    np.testing.assert_allclose(g[2], [-1, 0, 0], atol=2e-2)


def test_sdf_renders_like_analytic_sphere():
    grid = _sphere_sdf(48, 0.3)
    img_sdf = np.asarray(mi.render(mi.load_dict(_scene(grid)), spp=32, seed=0))
    d = _scene(grid)
    del d["sdf"]
    d["ball"] = {"type": "sphere", "center": [0.5, 0.5, 0.5], "radius": 0.3,
                 "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.3, 0.2]}}
    img_ref = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=0))
    # same silhouette: pixel sets with red dominance agree except a thin rim
    m_sdf = img_sdf[..., 0] > 1.2 * img_sdf[..., 2]
    m_ref = img_ref[..., 0] > 1.2 * img_ref[..., 2]
    disagree = (m_sdf != m_ref).mean()
    assert m_ref.mean() > 0.05            # the sphere is visible
    assert disagree < 0.03, disagree
    # shaded interior matches within tolerance
    inner = m_sdf & m_ref
    err = np.abs(img_sdf[inner] - img_ref[inner]).mean()
    assert err < 0.08, err


def test_sdf_grid_gradient_flows():
    """d(image)/d(grid values) is nonzero and matches finite differences on
    the mean intensity (the IFT coupling in _sdf_trace)."""
    grid = _sphere_sdf(24, 0.3)
    scene = mi.load_dict(_scene(grid))
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    path = dict(scene.param_paths)["sdf.grid"]

    def loss(g, eps_dir=None):
        s2 = _tree_set(scene, path, g)
        img = mi.render(s2, spp=16, seed=3)
        return img.mean()

    g0 = _tree_get(scene, path)
    val, grad = jax.value_and_grad(loss)(g0)
    grad = np.asarray(grad)
    assert np.isfinite(grad).all() and np.abs(grad).max() > 0
    # FD along the gradient direction.  The interior (IFT) term is what the
    # AD path computes; FD also sees the silhouette discontinuity, so keep
    # eps small and the tolerance loose (same stance as the reference's 0.05
    # rel tolerance on *boundary-aware* integrators).
    eps = 3e-4
    dirn = jnp.asarray(grad / np.linalg.norm(grad))
    lp = float(loss(g0 + eps * dirn))
    lm = float(loss(g0 - eps * dirn))
    fd = (lp - lm) / (2 * eps)
    ad = float(jnp.sum(jnp.asarray(grad) * dirn))
    assert abs(fd - ad) / max(abs(fd), 1e-6) < 0.2, (fd, ad)
