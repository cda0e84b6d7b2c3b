"""Polarized volumetric PRB (prb_polarized) — primal parity with polarized
volpath, replay gradients vs tape-AD and same-seed FD (reference pattern:
prb_polarized.py + test_ad_volpathaos.py thresholds)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _pol():
    mi.set_variant("mono_polarized")
    yield
    mi.set_variant("rgb")


def _rayleigh_slab(integrator="prb_polarized", g_phase=False):
    phase = {"type": "hg", "g": 0.4} if g_phase else {
        "type": "rayleigh", "depolarization": 0.0
    }
    return {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": 4},
        "atmo": {
            "type": "homogeneous",
            "phase": phase,
            "albedo": 0.8,
            "sigma_t": 0.4,
        },
        "slab": {
            "type": "cube", "bsdf": {"type": "null"},
            "to_world": [{"type": "scale", "value": [50.0, 50.0, 0.5]}],
            "interior": {"type": "ref", "id": "atmo"},
        },
        # sun straight down; 90-degree view -> strong linear polarization
        "sun": {"type": "directional", "direction": [0, 0, -1], "irradiance": 5.0},
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [-80, 0, 0], "target": [0, 0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 4, "height": 4,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 32},
        },
    }


def test_primal_matches_polarized_volpath():
    """The replay integrator's primal is the shared polarized volpath."""
    s_prb = mi.load_dict(_rayleigh_slab("prb_polarized"))
    assert getattr(s_prb.integrator, "is_prb", False)
    s_vol = mi.load_dict(_rayleigh_slab("volpath"))
    a = np.asarray(mi.render_1(s_prb, spp=128, seed=9))   # [4, C]
    b = np.asarray(mi.render_1(s_vol, spp=128, seed=9))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # sanity: the measurement is actually polarized (Rayleigh at 90 deg)
    assert np.hypot(a[1, 0], a[2, 0]) / a[0, 0] > 0.5


def _fd_and_prb(scene_dict, key, spp=512, seed=3, eps=1e-3, stokes_weight=None):
    scene = mi.load_dict(scene_dict)
    path = [p for k, p in scene.param_paths if k == key][0]
    base = _tree_get(scene, path)
    w = jnp.asarray(stokes_weight if stokes_weight is not None else [1.0, 0, 0, 0])

    def f(t):
        s2 = _tree_set(scene, path, base + t * jnp.ones_like(base))
        spec = mi.render_1(s2, spp=spp, seed=seed)        # [4, C]
        return jnp.sum(spec * w[:, None])

    fd = float((f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps))
    ad = float(jax.grad(f)(jnp.asarray(0.0)))
    return fd, ad


@pytest.mark.parametrize(
    "key",
    ["atmo.albedo.value.value", "sun.irradiance.value"],
)
def test_prb_polarized_grad_intensity(key):
    """Albedo / sun-irradiance gradients of the measured intensity agree with
    same-seed FD (< 0.05, the reference's test_ad_volpathaos.py threshold)."""
    fd, ad = _fd_and_prb(_rayleigh_slab(), key)
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (key, fd, ad, rel)


def test_prb_polarized_grad_q_component():
    """Gradient of the *Q* Stokes component (not just intensity): the Mueller
    replay's attached NEE must carry polarization through the sensor-frame
    rotation."""
    fd, ad = _fd_and_prb(
        _rayleigh_slab(), "atmo.albedo.value.value",
        stokes_weight=[0.0, 1.0, 0.0, 0.0],
    )
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.08, (fd, ad, rel)


def test_prb_polarized_grad_hg_g():
    """HG anisotropy gradient via attached-eval/detached-pdf replay.  FD
    differentiates the g-reparameterized sampled directions while PRB is the
    detached estimator, so they agree in expectation (measured: fd
    -0.397+-0.020, ad -0.403+-0.002 over seeds — PRB ~8x lower variance)."""
    fds, ads = [], []
    for seed in (3, 11, 29):
        fd, ad = _fd_and_prb(
            _rayleigh_slab(g_phase=True), "atmo.phase_function.g",
            spp=1024, seed=seed,
        )
        fds.append(fd)
        ads.append(ad)
    fd_m, ad_m = np.mean(fds), np.mean(ads)
    assert fd_m != 0.0
    assert abs(ad_m - fd_m) < max(3 * np.std(fds), 0.1 * abs(fd_m)), (fds, ads)
    assert np.std(ads) < np.std(fds)


def test_prb_polarized_sigma_t_grad():
    """sigma_t: PRB detached estimator vs seed-averaged FD (FD differentiates
    the reparameterized realization; agreement is in expectation)."""
    fds, ads = [], []
    for seed in (3, 11, 29):
        fd, ad = _fd_and_prb(
            _rayleigh_slab(), "atmo.sigma_t.value.value", spp=1024, seed=seed
        )
        fds.append(fd)
        ads.append(ad)
    fd_m, ad_m = np.mean(fds), np.mean(ads)
    assert abs(ad_m - fd_m) < max(3 * np.std(fds), 0.12 * abs(fd_m)), (fds, ads)


def test_prb_polarized_routing():
    """prb/prbvolpath in polarized variants route to the dedicated replay."""
    from mitsuba_tpu.ad.prb_polarized import PRBPolarizedVolpathIntegrator

    for name in ("prb", "prbvolpath", "prb_polarized"):
        d = _rayleigh_slab(name)
        scene = mi.load_dict(d)
        assert isinstance(scene.integrator, PRBPolarizedVolpathIntegrator), name
