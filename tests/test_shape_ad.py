"""Differentiable shape parameters — the *interior* (smooth) term.

Reference: mesh `vertex_positions` is Differentiable|Discontinuous
(src/render/mesh.cpp:84-91).  These tests validate the Differentiable part:
moving geometry where no silhouette crosses the view changes the image
smoothly, and AD through the intersection backends must match central finite
differences.  (The Discontinuous part is covered by the projective-layer
tests.)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("llvm_ad_rgb")
    yield


def _plane_scene(integrator):
    """Large diffuse plane filling the view, lit by a point light: radiance
    per pixel is smooth in the plane's position (cos / r^2)."""
    d = {
        "type": "scene",
        "integrator": integrator,
        "sensor": {
            "type": "perspective",
            "fov": 20.0,
            "to_world": {
                "type": "look_at",
                "origin": [0, 0, 4],
                "target": [0, 0, 0],
                "up": [0, 1, 0],
            },
            "film": {
                "type": "hdrfilm",
                "width": 12,
                "height": 12,
                "rfilter": {"type": "box"},
            },
        },
        "plane": {
            "type": "rectangle",
            "to_world": mi.Transform.scale([4, 4, 1]),
            "bsdf": {
                "type": "diffuse",
                "reflectance": {"type": "rgb", "value": [0.7, 0.5, 0.3]},
            },
        },
        "light": {"type": "point", "position": [1.0, 1.0, 3.0], "intensity": 40.0},
    }
    return mi.load_dict(d)


def _path_for(scene, key):
    for k, p in scene.param_paths:
        if k == key:
            return p
    raise KeyError(key)


def test_vertex_positions_in_traverse():
    scene = _plane_scene({"type": "path", "max_depth": 2})
    params = mi.traverse(scene)
    assert "plane.vertex_positions" in params
    vp = params["plane.vertex_positions"]
    assert vp.shape == (4, 3)


def test_interior_gradient_vs_fd():
    """Translate the plane along +z (toward light/camera): AD == FD."""
    scene = _plane_scene({"type": "path", "max_depth": 2})
    path = _path_for(scene, "plane.vertex_positions")
    base = _tree_get(scene, path)
    offset = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (base.shape[0], 1))

    def loss(t):
        s2 = _tree_set(scene, path, base + t * offset)
        img = mi.render(s2, spp=16, seed=5)
        return jnp.sum(img)

    eps = 1e-3
    fd = (loss(jnp.asarray(eps)) - loss(jnp.asarray(-eps))) / (2 * eps)
    ad = jax.grad(loss)(jnp.asarray(0.0))
    assert np.isfinite(float(fd)) and abs(float(fd)) > 1e-3
    assert abs(float(ad) - float(fd)) < 0.05 * max(abs(float(fd)), 1e-6), (
        float(ad),
        float(fd),
    )


def test_params_update_refreshes_geometry():
    """Writing vertex_positions through SceneParameters re-derives the
    triangle tables (parameters_changed cascade)."""
    scene = _plane_scene({"type": "path", "max_depth": 2})
    params = mi.traverse(scene)
    vp = params["plane.vertex_positions"]
    params["plane.vertex_positions"] = vp + jnp.asarray([0.0, 0.0, 0.5])
    scene2 = params.update()
    np.testing.assert_allclose(
        np.asarray(scene2.geometry.tri_v0[:2, 2]), 0.5, atol=1e-6
    )
    # moving the whole mesh rigidly leaves edge vectors unchanged
    np.testing.assert_allclose(
        np.asarray(scene2.geometry.tri_e1[:2]),
        np.asarray(scene.geometry.tri_e1[:2]),
        atol=1e-6,
    )


def _mt_reference(tri9, o, d):
    """Pure-jnp Moller-Trumbore for one ray/tri pair (autodiff oracle)."""
    v0, e1, e2 = tri9[0:3], tri9[3:6], tri9[6:9]
    pvec = jnp.cross(d, e2)
    det = jnp.dot(e1, pvec)
    tvec = o - v0
    u = jnp.dot(tvec, pvec) / det
    qvec = jnp.cross(tvec, e1)
    v = jnp.dot(d, qvec) / det
    t = jnp.dot(e2, qvec) / det
    return jnp.stack([t, u, v])


def test_mt_vjp_matches_autodiff():
    """mt_vjp (shared by the Pallas and BVH backends) == tape AD of the
    closed-form solve, for ray AND geometry inputs."""
    from mitsuba_tpu.ops.intersect import mt_vjp

    rs = np.random.RandomState(7)
    for _ in range(5):
        v0 = rs.randn(3).astype(np.float32)
        e1 = rs.randn(3).astype(np.float32)
        e2 = rs.randn(3).astype(np.float32)
        # aim the ray at a point inside the triangle
        uu, vv = 0.3, 0.4
        target = v0 + uu * e1 + vv * e2
        o = target + np.asarray([0.0, 0.0, 3.0], np.float32) + 0.1 * rs.randn(3).astype(np.float32)
        dn = target - o
        d = (dn / np.linalg.norm(dn)).astype(np.float32)

        tri9 = jnp.asarray(np.concatenate([v0, e1, e2]))
        g = rs.randn(3).astype(np.float32)  # cotangent on (t, u, v)

        J = jax.jacobian(_mt_reference, argnums=(0, 1, 2))(
            tri9, jnp.asarray(o), jnp.asarray(d)
        )
        want_tri = jnp.einsum("i,ij->j", g, J[0])
        want_o = jnp.einsum("i,ij->j", g, J[1])
        want_d = jnp.einsum("i,ij->j", g, J[2])

        y = mt_vjp(
            jnp.asarray(e1)[None],
            jnp.asarray(e2)[None],
            jnp.asarray(d)[None],
            jnp.asarray(g[0:1]),
            jnp.asarray(g[1:2]),
            jnp.asarray(g[2:3]),
            jnp.ones((1,), bool),
        )[0]
        tuv = _mt_reference(tri9, jnp.asarray(o), jnp.asarray(d))
        t, u, v = tuv[0], tuv[1], tuv[2]
        got_o = y
        got_d = t * y
        got_tri = jnp.concatenate([-y, -u * y, -v * y])
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_tri), np.asarray(want_tri), rtol=2e-3, atol=1e-4)
