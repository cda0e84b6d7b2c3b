"""Volumetric PRB (prbvolpath/prb_unpolarized) gradients vs finite
differences (reference pattern: test_ad_volpathaos.py thresholds)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _mono():
    mi.set_variant("mono")
    yield
    mi.set_variant("rgb")


def _medium_scene():
    return {
        "type": "scene",
        "integrator": {"type": "prbvolpath", "max_depth": 3},
        "a_medium": {
            "type": "homogeneous",
            "phase": {"type": "hg", "g": 0.5},
            "albedo": 0.5,
            "sigma_t": 1.0,
        },
        "top": {
            "type": "rectangle", "bsdf": {"type": "null"},
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
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 8, "height": 8, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
    }


def _fd_prb(scene, key, spp=256, seed=3, eps=1e-3):
    path = [p for k, p in scene.param_paths if k == key][0]
    base = _tree_get(scene, path)

    def f(t):
        s2 = _tree_set(scene, path, base + t * jnp.ones_like(base))
        return jnp.sum(mi.render_1(s2, spp=spp, seed=seed))

    fd = float((f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps))
    ad = float(jax.grad(f)(jnp.asarray(0.0)))
    return fd, ad


@pytest.mark.parametrize(
    "key",
    [
        "a_medium.albedo.value.value",
        "light.emitter.radiance.value",
        "a_medium.phase_function.g",
    ],
)
def test_prbvolpath_grad_exact_terms(key):
    """Albedo / emitter-radiance / HG-g gradients agree with same-seed FD to
    the reference threshold (< 0.05; test_ad_volpathaos.py:57-58)."""
    scene = mi.load_dict(_medium_scene())
    assert getattr(scene.integrator, "is_prb", False)
    fd, ad = _fd_prb(scene, key)
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (key, fd, ad, rel)


def test_prbvolpath_sigma_t_grad():
    """sigma_t gradients: FD differentiates the reparameterized realization
    (flight distances move with the majorant) while PRB is the detached
    estimator — they agree in expectation; compare seed-averaged FD with a
    tolerance informed by the FD spread.  (Observed: PRB variance ~20x lower
    than FD.)"""
    scene = mi.load_dict(_medium_scene())
    fds, ads = [], []
    for seed in (3, 11, 29):
        fd, ad = _fd_prb(scene, "a_medium.sigma_t.value.value", spp=1024, seed=seed)
        fds.append(fd)
        ads.append(ad)
    fd_m, ad_m = np.mean(fds), np.mean(ads)
    assert abs(ad_m - fd_m) < max(3 * np.std(fds), 0.1 * abs(fd_m)), (fds, ads)
    # PRB replay should be the lower-variance estimator
    assert np.std(ads) < np.std(fds)


def test_prbvolpath_primal_matches_volpath():
    d = _medium_scene()
    s_prb = mi.load_dict(d)
    d["integrator"] = {"type": "volpath", "max_depth": 3}
    s_vol = mi.load_dict(d)
    a = np.asarray(mi.render_1(s_prb, spp=64, seed=5))
    b = np.asarray(mi.render_1(s_vol, spp=64, seed=5))
    np.testing.assert_allclose(a, b, atol=1e-5)
