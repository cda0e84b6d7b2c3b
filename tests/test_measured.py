"""Measured BSDF (reference: src/bsdfs/measured.cpp) + Marginal2D machinery.

No network access to the RGL material database here, so the tests synthesize
a `.bsdf` tensor file from an analytic GGX model: the vndf/luminance/spectra
tables are built exactly the way the RGL pipeline lays them out (spectra and
luminance live in the intermediate unit square that feeds the VNDF warp), and
the measured plugin must then reproduce the analytic BRDF it was baked from.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import ChiSquareTest
from mitsuba_tpu.core.distr2d import MarginalContinuous2D
from mitsuba_tpu.render import microfacet as mf
from mitsuba_tpu.render.bsdf_measured import (
    MeasuredBSDF, load_tensor_file, write_tensor_file,
    _u2theta, _u2phi, _theta2u, _phi2u,
)
from mitsuba_tpu.render.records import SurfaceInteraction

ALPHA = 0.35
REFL = np.array([1.0, 0.7, 0.4], np.float32)


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _ggx_f_cos(wi, wo):
    """Analytic f(wi,wo)*cos_o for GGX with constant channel reflectance."""
    h = wi + wo
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    d = np.asarray(mf.ggx_d(jnp.asarray(h), ALPHA, ALPHA))
    g = np.asarray(
        mf.ggx_g(jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(h), ALPHA, ALPHA)
    )
    cos_i = wi[..., 2]
    base = d * g / np.maximum(4.0 * cos_i, 1e-9)
    valid = (cos_i > 0) & (wo[..., 2] > 0)
    return np.where(valid[..., None], base[..., None] * REFL, 0.0)


@pytest.fixture(scope="module")
def bsdf_file(tmp_path_factory):
    H = W = 48
    NTI = 24
    theta_i = np.linspace(0.0, np.pi / 2 * 0.98, NTI).astype(np.float32)
    phi_i = np.zeros((1,), np.float32)

    ux = np.linspace(0, 1, W, dtype=np.float32)
    uy = np.linspace(0, 1, H, dtype=np.float32)
    UX, UY = np.meshgrid(ux, uy)
    th_m = np.asarray(_u2theta(jnp.asarray(UX)))
    ph_m = np.asarray(_u2phi(jnp.asarray(UY)))
    sin_m = np.sin(th_m)
    m = np.stack(
        [np.cos(ph_m) * sin_m, np.sin(ph_m) * sin_m, np.cos(th_m)], -1
    )

    d_ndf = np.asarray(mf.ggx_d(jnp.asarray(m.reshape(-1, 3)), ALPHA, ALPHA)).reshape(H, W)
    # ndf table: density over u_m with NO jacobian (eval'd directly at u_m)
    ndf = d_ndf.astype(np.float32)

    # sigma(theta_i): projected area of the NDF = int D(m) max(0, wi.m) dm
    # (GGX: equals cos(theta_i) after Smith normalization identity)
    sigma = np.cos(theta_i)[None, :].astype(np.float32)
    ndf_t = np.broadcast_to(ndf[None], (1, *ndf.shape)).astype(np.float32)
    sigma_t = np.broadcast_to(sigma[..., None], (*sigma.shape, 1)).astype(np.float32)
    # sigma is eval'd at u_wi = (theta2u(theta_i), phi2u(phi_i)) — put the
    # theta axis on x (W) and make it 2 rows tall (phi) for bilinear eval
    sig_tab = np.repeat(sigma[None, 0:1, :], 2, axis=1)[0]          # [2, NTI]

    # vndf in u-space: D(m) <wi, m>+ * |domega/du| with |J| = 2 pi^2 u_x sin
    jac = 2.0 * np.pi**2 * UX * sin_m
    vndf = np.zeros((1, NTI, H, W), np.float32)
    for i, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0.0, np.cos(ti)], np.float32)
        dv = d_ndf * np.maximum(m @ wi, 0.0) * jac
        vndf[0, i] = dv

    # spectra/luminance live in the INTERMEDIATE square feeding the vndf
    # warp: at grid point p, u_m = vndf.sample(p), wo = reflect(wi, m(u_m))
    warp = MarginalContinuous2D.create(vndf, (phi_i, theta_i))
    spectra = np.zeros((1, NTI, 3, H, W), np.float32)
    luminance = np.zeros((1, NTI, H, W), np.float32)
    P = np.stack([UX.reshape(-1), UY.reshape(-1)], -1).astype(np.float32)
    for i, ti in enumerate(theta_i):
        pars = (jnp.zeros((P.shape[0],)), jnp.full((P.shape[0],), ti))
        u_m, _ = warp.sample(jnp.asarray(P), pars)
        u_m = np.asarray(u_m)
        th = np.asarray(_u2theta(jnp.asarray(u_m[:, 0])))
        ph = np.asarray(_u2phi(jnp.asarray(u_m[:, 1])))
        sm = np.sin(th)
        mm = np.stack([np.cos(ph) * sm, np.sin(ph) * sm, np.cos(th)], -1)
        wi = np.array([np.sin(ti), 0.0, np.cos(ti)], np.float32)
        wo = 2.0 * (mm @ wi)[:, None] * mm - wi
        fc = _ggx_f_cos(np.broadcast_to(wi, wo.shape), wo)      # [n, 3]
        spectra[0, i] = fc.T.reshape(3, H, W)
        luminance[0, i] = fc.mean(-1).reshape(H, W)

    luminance = np.maximum(luminance, 1e-5)
    fields = {
        "description": np.frombuffer(b"synthetic ggx", np.uint8),
        "theta_i": theta_i,
        "phi_i": phi_i,
        "ndf": ndf_t[0],
        "sigma": sig_tab,
        "vndf": vndf,
        "luminance": luminance,
        "rgb": spectra,
        "jacobian": np.array([0], np.uint8),
    }
    path = tmp_path_factory.mktemp("bsdf") / "ggx_synth.bsdf"
    write_tensor_file(str(path), fields)
    return str(path)


def test_tensor_roundtrip(bsdf_file):
    tf = load_tensor_file(bsdf_file)
    assert tf["vndf"].shape == (1, 24, 48, 48)
    assert tf["rgb"].shape == (1, 24, 3, 48, 48)


def test_measured_eval_matches_analytic(bsdf_file):
    b = MeasuredBSDF.from_file(bsdf_file)
    rng = np.random.default_rng(0)
    N = 4096
    wi = rng.normal(size=(N, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.15
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rng.normal(size=(N, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.15
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    got = np.asarray(b.eval(si, jnp.asarray(wo), None, 3))
    ref = _ggx_f_cos(wi, wo)
    # interpolated tables: compare in aggregate + pointwise where smooth
    mask = ref[:, 0] > 1e-3
    rel = np.abs(got[mask] - ref[mask]) / np.maximum(ref[mask], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)
    assert abs(got[mask].mean() / ref[mask].mean() - 1.0) < 0.05
    # channel ratios follow the baked reflectance
    np.testing.assert_allclose(
        got[mask, 1].sum() / got[mask, 0].sum(), 0.7, rtol=0.05
    )


def test_measured_sample_weight_consistency(bsdf_file):
    """weight == eval/pdf at the sampled direction (the reference identity
    sample().second == eval/pdf)."""
    b = MeasuredBSDF.from_file(bsdf_file)
    rng = np.random.default_rng(1)
    N = 2048
    wi = np.tile(np.array([[0.35, -0.2, 0.915]], np.float32), (N, 1))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    u2 = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    bs, w = b.sample(None, u2, si, None, 3)
    ok = np.asarray(bs.pdf) > 1e-4
    ev = np.asarray(b.eval(si, bs.wo, None, 3))
    pdf = np.asarray(b.pdf(si, bs.wo))
    w = np.asarray(w)
    np.testing.assert_allclose(
        w[ok], ev[ok] / np.maximum(pdf[ok, None], 1e-12), rtol=2e-2, atol=1e-3
    )


def test_measured_chi2(bsdf_file):
    b = MeasuredBSDF.from_file(bsdf_file)
    wi = np.array([0.3, 0.12, 0.95], np.float32)
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

    t = ChiSquareTest(sample_func, pdf_func, sample_count=200_000, seed=7)
    assert t.run()


def test_measured_in_scene(bsdf_file):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 24
    d["sensor"]["film"]["height"] = 24
    d["small-box"]["bsdf"] = {"type": "measured", "filename": bsdf_file}
    img = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=0))
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
