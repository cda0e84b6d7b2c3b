"""Hair BSDF (reference: src/bsdfs/hair.cpp; Chiang et al. 2016)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import ChiSquareTest
from mitsuba_tpu.render.bsdf_hair import HairBSDF, rough_fiber_pdf
from mitsuba_tpu.render.records import SurfaceInteraction


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _hair(**kw):
    d = dict(
        longitudinal_roughness=0.3, azimuthal_roughness=0.3, alpha=2.0,
        eta=1.55, eumelanin=1.3, pheomelanin=0.2,
    )
    d.update(kw)
    return HairBSDF(**{k: jnp.asarray(v, jnp.float32) for k, v in d.items()})


def test_rough_fiber_pdf_normalized():
    """Longitudinal density integrates to 1 over the sphere."""
    rng = np.random.default_rng(0)
    N = 400_000
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    wi = jnp.asarray([0.4, 0.5, 0.768], jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    for kappa in (2.0, 30.0, 300.0):
        p = np.asarray(
            rough_fiber_pdf(jnp.asarray(d), jnp.broadcast_to(wi, (N, 3)), kappa)
        )
        integral = p.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.02, (kappa, integral)


@pytest.mark.parametrize("wi", [[0.5, 0.3, 0.81], [0.9, -0.4, 0.17], [0.05, 0.05, 0.997]])
def test_hair_chi2(wi):
    b = _hair()
    wi = np.asarray(wi, np.float32)
    wi /= np.linalg.norm(wi)

    def sample_func(u1, u2):
        n = u1.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        )
        bs, w = b.sample(u1, u2, si, None, 3)
        return bs.wo, bs.pdf > 0

    def pdf_func(d):
        n = d.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        )
        return b.pdf(si, d)

    t = ChiSquareTest(sample_func, pdf_func, sample_count=200_000, seed=5)
    assert t.run(), t.p_value


def test_hair_white_furnace():
    """sigma_a = 0 (white hair): scattered energy ~1 (energy conservation of
    the d'Eon lobes; reference tests use the same white-furnace property)."""
    b = _hair(eumelanin=0.0, pheomelanin=0.0)
    rng = np.random.default_rng(2)
    N = 200_000
    wi = np.asarray([0.3, 0.2, 0.933], np.float32)
    wi /= np.linalg.norm(wi)
    si = SurfaceInteraction.invalid(N).replace(
        wi=jnp.broadcast_to(jnp.asarray(wi), (N, 3))
    )
    u1 = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    bs, w = b.sample(u1, u2, si, None, 3)
    # E[weight] = integral of f over sphere (importance sampled)
    total = np.asarray(w).mean(axis=0)
    assert (total > 0.9).all() and (total < 1.05).all(), total


def test_hair_absorption_darkens():
    b0 = _hair(eumelanin=0.0, pheomelanin=0.0)
    b1 = _hair(eumelanin=3.0, pheomelanin=0.5)
    rng = np.random.default_rng(3)
    N = 50_000
    wi = np.asarray([0.3, 0.2, 0.933], np.float32)
    wi /= np.linalg.norm(wi)
    si = SurfaceInteraction.invalid(N).replace(
        wi=jnp.broadcast_to(jnp.asarray(wi), (N, 3))
    )
    u1 = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    _, w0 = b0.sample(u1, u2, si, None, 3)
    _, w1 = b1.sample(u1, u2, si, None, 3)
    assert np.asarray(w1).mean() < 0.7 * np.asarray(w0).mean()
    # eumelanin absorbs blue more than red -> brownish tint
    m1 = np.asarray(w1).mean(axis=0)
    assert m1[0] > m1[2]


def test_hair_loader():
    d = mi.cornell_box()
    d["small-box"]["bsdf"] = {"type": "hair", "eumelanin": 0.4}
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=4, seed=0))
    assert np.isfinite(img).all()
