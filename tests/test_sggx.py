"""SGGX microflake phase (reference: src/phase/sggx.cpp,
include/mitsuba/render/microflake.h)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import ChiSquareTest, PhaseFunctionAdapter
from mitsuba_tpu.render.phase import (
    SGGXPhase, sggx_ndf_pdf, sggx_projected_area, sggx_sample_normal,
)
from mitsuba_tpu.render.records import MediumInteraction
from mitsuba_tpu.render.volumes import ConstVolume


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _mei_maker(d):
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d)

    def make(n):
        return MediumInteraction.make(
            jnp.ones((n,), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.broadcast_to(jnp.asarray(d), (n, 3)),
            jnp.zeros((n,), jnp.int32),
        )

    return make


def _phase(s6):
    return SGGXPhase(S=ConstVolume(value=jnp.asarray(s6, jnp.float32)))


def test_sggx_sphere_is_isotropic():
    """S = identity: flakes form a sphere; pdf = 1/4pi, projected area 1."""
    ph = _phase([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    mei = _mei_maker([0.2, -0.4, 0.7])(64)
    rng = np.random.default_rng(0)
    wo = rng.normal(size=(64, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val, pdf = ph.eval_pdf(mei, jnp.asarray(wo), None, 1)
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ph.projected_area(mei)), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "s6,d",
    [
        ([1.0, 0.35, 0.08, 0.0, 0.0, 0.0], [0.3, -0.5, 0.81]),   # ellipsoid
        ([1.0, 1.0, 0.01, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),      # flake disc
        ([0.6, 0.8, 0.9, 0.1, -0.15, 0.2], [-0.6, 0.2, 0.77]),   # full S
    ],
)
def test_sggx_chi2(s6, d):
    sample_func, pdf_func = PhaseFunctionAdapter(
        _phase(s6), mei_maker=_mei_maker(d)
    )
    t = ChiSquareTest(sample_func, pdf_func, sample_count=200_000, seed=3)
    assert t.run()


def test_sggx_vndf_normalization():
    """Integral of D(wm) <wm, wi> over the sphere = projected area sigma(wi)
    (the visible-normal density normalization)."""
    s6 = jnp.asarray([1.0, 0.5, 0.1, 0.05, -0.1, 0.02], jnp.float32)
    rng = np.random.default_rng(5)
    n = 400_000
    wm = rng.normal(size=(n, 3)).astype(np.float32)
    wm /= np.linalg.norm(wm, axis=-1, keepdims=True)
    wi = jnp.asarray([0.3, -0.2, 0.93], jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    s6b = jnp.broadcast_to(s6, (n, 6))
    D = sggx_ndf_pdf(jnp.asarray(wm), s6b)
    proj = jnp.abs(jnp.sum(jnp.asarray(wm) * wi, axis=-1))
    # (1/2) * mean(D * |cos|) * 4pi  — flakes are two-sided: integral of
    # D(wm) max(dot,0) over the sphere equals (1/2) integral of D |dot|
    est = 0.5 * float(jnp.mean(D * proj)) * 4 * np.pi
    ref = float(sggx_projected_area(wi[None], s6[None])[0])
    assert abs(est - ref) / ref < 0.01


def test_sggx_medium_sigma_scaling():
    """Medium coefficients are scaled by the projected area when the phase is
    microflake (reference: homogeneous.cpp:158-159)."""
    d = {
        "type": "scene",
        "shape": {
            "type": "cube",
            "interior": {
                "type": "homogeneous",
                "sigma_t": 1.0,
                "albedo": 0.9,
                "phase": {"type": "sggx", "S": [1.0, 1.0, 0.04, 0.0, 0.0, 0.0]},
            },
            "bsdf": {"type": "null"},
        },
        "integrator": {"type": "volpath", "max_depth": 4},
        "emitter": {"type": "constant"},
        "sensor": {
            "type": "perspective",
            "fov": 45,
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
    }
    scene = mi.load_dict(d)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32)
    p = jnp.zeros((2, 3), jnp.float32)
    idx = jnp.zeros((2,), jnp.int32)
    ss, sn, st = scene.medium_coefficients(idx, p, dirs)
    # wi = -d: along z the projected area is sqrt(0.04)=0.2; along x it is 1
    np.testing.assert_allclose(np.asarray(st[0]), 0.2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st[1]), 1.0, rtol=1e-5)
    # null density compensates so majorant stays valid
    np.testing.assert_allclose(np.asarray(st + sn)[0], 1.0, rtol=1e-5)
    img = np.asarray(mi.render(scene, spp=8, seed=0))
    assert np.isfinite(img).all() and (img >= 0).all()
