"""volpathmis: spectral null-scattering path-integral MIS
(reference: src/integrators/volpathmis.cpp, Miller et al. 2019).

Validation per VERDICT round-1 item 3: (a) primal match vs volpath on a
medium with strongly wavelength-dependent extinction, (b) variance
reduction vs volpath's hero-channel estimator on the same medium,
(c) furnace equilibrium."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _scene_dict(integrator, sigma_t, albedo=0.9, spp=64, max_depth=12):
    return {
        "type": "scene",
        "integrator": integrator,
        "sensor": {
            "type": "perspective",
            "fov": 10,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 6], "target": [0, 0, 0],
                 "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 12, "height": 12,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "medium1": {
            "type": "homogeneous",
            "sigma_t": {"type": "rgb", "value": sigma_t},
            "albedo": albedo,
            "phase": {"type": "isotropic"},
        },
        "bounds": {
            "type": "cube",
            "bsdf": {"type": "null"},
            "interior": {"type": "ref", "id": "medium1"},
        },
        "env": {"type": "constant", "radiance": 1.0},
    }


SPECTRAL_SIGMA = [4.0, 1.0, 0.08]   # strongly wavelength-dependent extinction


def test_registered_not_alias():
    s1 = mi.load_dict(_scene_dict({"type": "volpathmis"}, SPECTRAL_SIGMA))
    s2 = mi.load_dict(_scene_dict({"type": "volpath"}, SPECTRAL_SIGMA))
    assert type(s1.integrator).__name__ == "VolPathMisIntegrator"
    assert type(s2.integrator).__name__ == "VolPathIntegrator"


def test_furnace_equilibrium():
    """Albedo-1 spectrally-varying medium in a unit radiance field: every
    channel must stay 1 (strict test of the weight-matrix bookkeeping)."""
    d = _scene_dict(
        {"type": "volpathmis", "max_depth": 48, "rr_depth": 64},
        SPECTRAL_SIGMA, albedo=1.0,
    )
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=200, seed=3))
    np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, rtol=0.03)


def test_primal_match_vs_volpath():
    """Mildly spectral medium: both estimators converge fast enough to
    compare directly (on SPECTRAL_SIGMA volpath's non-hero weights
    exp((sig_h-sig_j) t) are too heavy-tailed for a 1k-spp comparison)."""
    mild = [1.5, 1.0, 0.5]
    d1 = _scene_dict({"type": "volpathmis", "max_depth": 12}, mild)
    d2 = _scene_dict({"type": "volpath", "max_depth": 12}, mild)
    a = np.zeros(3)
    b = np.zeros(3)
    for seed in range(4):
        a += np.asarray(mi.render(mi.load_dict(d1), spp=256, seed=seed)).mean((0, 1))
        b += np.asarray(mi.render(mi.load_dict(d2), spp=256, seed=seed)).mean((0, 1))
    np.testing.assert_allclose(a / 4, b / 4, rtol=0.04)


def test_primal_vs_scalar_ground_truth():
    """Per-channel ground truth: rendering channel c of SPECTRAL_SIGMA must
    equal a render with uniform sigma_t = SPECTRAL_SIGMA[c] (where hero
    tracking is analog in every channel, i.e. near-zero tracking variance)."""
    d = _scene_dict({"type": "volpathmis", "max_depth": 12}, SPECTRAL_SIGMA)
    a = np.zeros(3)
    for seed in range(4):
        a += np.asarray(mi.render(mi.load_dict(d), spp=256, seed=seed)).mean((0, 1))
    a /= 4
    gt = np.zeros(3)
    for c, s in enumerate(SPECTRAL_SIGMA):
        dg = _scene_dict({"type": "volpath", "max_depth": 12}, [s, s, s])
        r = np.zeros(3)
        for seed in range(4):
            r += np.asarray(mi.render(mi.load_dict(dg), spp=256, seed=seed)).mean((0, 1))
        gt[c] = r[c] / 4
    np.testing.assert_allclose(a, gt, rtol=0.05)


def test_variance_reduction_spectral():
    """On a strongly spectrally-varying medium, volpathmis' spectral MIS must
    beat volpath's single-hero-channel estimator in per-pixel variance
    (the algorithm's raison d'etre, volpathmis.cpp:44-48)."""
    d1 = _scene_dict({"type": "volpathmis", "max_depth": 12}, SPECTRAL_SIGMA)
    d2 = _scene_dict({"type": "volpath", "max_depth": 12}, SPECTRAL_SIGMA)
    s1 = mi.load_dict(d1)
    s2 = mi.load_dict(d2)
    r1, r2 = [], []
    for seed in range(8):
        r1.append(np.asarray(mi.render(s1, spp=32, seed=seed)))
        r2.append(np.asarray(mi.render(s2, spp=32, seed=seed)))
    v1 = np.stack(r1).var(axis=0).mean()
    v2 = np.stack(r2).var(axis=0).mean()
    assert v1 < 0.8 * v2, (v1, v2)
