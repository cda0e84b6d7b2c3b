"""Measured polarized pBRDF (reference: src/bsdfs/measured_polarized.cpp).

No access to the KAIST pBRDF database here, so the tests synthesize .pbsdf
tensor files with analytically-known Mueller content (a depolarizing
Lambertian, a tabulated-frame polarizer, NaN-encoded invalid cells) and
check the plugin reproduces the analytic answers, the cosine/GGX mixture
sampling identities, and the Stokes frame rotation invariants.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import ChiSquareTest
from mitsuba_tpu.render.bsdf_measured import write_tensor_file
from mitsuba_tpu.render.bsdf_measured_polarized import MeasuredPolarizedBSDF
from mitsuba_tpu.render.records import SurfaceInteraction

NP_, ND, NH = 9, 8, 8
WVLS = np.array([450, 500, 550, 600, 650], np.uint16)


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield
    mi.set_variant("rgb")


def _grids():
    phi_d = np.linspace(-np.pi, np.pi, NP_).astype(np.float32)
    theta_d = np.linspace(0.0, np.pi / 2, ND).astype(np.float32)
    theta_h = np.linspace(0.0, np.pi / 2, NH).astype(np.float32)
    return phi_d, theta_d, theta_h


def _write(tmp_path, M, name):
    phi_d, theta_d, theta_h = _grids()
    fn = str(tmp_path / name)
    write_tensor_file(fn, {
        "phi_d": phi_d.reshape(1, -1),
        "theta_d": theta_d.reshape(1, -1),
        "theta_h": theta_h.reshape(1, -1),
        "wvls": WVLS,
        "M": M.astype(np.float32),
    })
    return fn


def _albedo(lam):
    """Wavelength-linear albedo so multilinear interpolation is exact."""
    return 0.2 + (lam - 450.0) / 500.0


@pytest.fixture(scope="module")
def lambert_file(tmp_path_factory):
    """M00 = albedo(lambda)/pi, all other entries zero: an ideal
    depolarizing Lambertian pBRDF, constant in the angular dims."""
    tmp = tmp_path_factory.mktemp("pbsdf")
    M = np.zeros((NP_, ND, NH, len(WVLS), 4, 4), np.float32)
    M[..., 0, 0] = _albedo(WVLS.astype(np.float32))[None, None, None, :] / np.pi
    return _write(tmp, M, "lambert.pbsdf")


def _dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.1
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_eval_lambert_spectral(lambert_file):
    b = MeasuredPolarizedBSDF.from_file(lambert_file)
    N = 512
    wi, wo = _dirs(N, 0), _dirs(N, 1)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    wl = np.stack([np.full(N, 470.0), np.full(N, 555.0), np.full(N, 632.0)], -1)
    got = np.asarray(b.eval(si, jnp.asarray(wo), jnp.asarray(wl, jnp.float32), 3))
    want = _albedo(wl) / np.pi * wo[:, 2:3]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_eval_rgb_pinned_wavelength(lambert_file):
    """RGB mode requires the `wavelength` parameter; all channels then see
    the pinned wavelength (measured_polarized.cpp:318-323)."""
    b = MeasuredPolarizedBSDF.from_file(lambert_file, wavelength=550.0)
    N = 64
    wi, wo = _dirs(N, 2), _dirs(N, 3)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    got = np.asarray(b.eval(si, jnp.asarray(wo), None, 3))
    want = _albedo(550.0) / np.pi * wo[:, 2:3] * np.ones((1, 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_white_furnace_and_pdf(lambert_file):
    """E[weight] over the cosine/GGX mixture = integral of f*cos = albedo;
    pdf integrates to 1 over the hemisphere."""
    b = MeasuredPolarizedBSDF.from_file(lambert_file, wavelength=650.0)
    N = 200_000
    rng = np.random.default_rng(5)
    wi = np.tile(np.array([[0.3, -0.1, 0.95]], np.float32), (N, 1))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    u1 = jnp.asarray(rng.random(N, dtype=np.float32))
    u2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))
    bs, w = b.sample(u1, u2, si, None, 1)
    est = float(np.asarray(w)[:, 0].mean())
    assert abs(est - _albedo(650.0)) < 0.01, est

    # pdf normalization: uniform-hemisphere MC of pdf / (1/2pi)
    u = rng.random((N, 2))
    z = u[:, 0]
    r = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    pdf = np.asarray(b.pdf(si, jnp.asarray(d)))
    assert abs(pdf.mean() * 2 * np.pi - 1.0) < 0.02


def test_sample_weight_identity(lambert_file):
    b = MeasuredPolarizedBSDF.from_file(lambert_file, wavelength=550.0)
    N = 4096
    rng = np.random.default_rng(7)
    wi = np.tile(np.array([[0.0, 0.4, 0.9165]], np.float32), (N, 1))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    u1 = jnp.asarray(rng.random(N, dtype=np.float32))
    u2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))
    bs, w = b.sample(u1, u2, si, None, 3)
    ok = np.asarray(bs.pdf) > 1e-4
    ev = np.asarray(b.eval(si, bs.wo, None, 3))
    pdf = np.asarray(b.pdf(si, bs.wo))
    np.testing.assert_allclose(
        np.asarray(w)[ok], ev[ok] / np.maximum(pdf[ok, None], 1e-12),
        rtol=2e-2, atol=1e-4,
    )


def test_mueller_m00_matches_eval(lambert_file):
    """Stokes basis rotations leave M00 invariant, so the polarized eval's
    (0,0) entry must equal the scalar eval exactly."""
    b = MeasuredPolarizedBSDF.from_file(lambert_file, wavelength=550.0)
    N = 256
    wi, wo = _dirs(N, 8), _dirs(N, 9)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    M, pdf = b.eval_pdf_mueller(si, jnp.asarray(wo), None, 3)
    ev = b.eval(si, jnp.asarray(wo), None, 3)
    np.testing.assert_allclose(np.asarray(M)[..., 0, 0], np.asarray(ev), rtol=1e-4, atol=1e-6)
    # pure depolarizer table: rotation keeps the matrix M00-only
    off = np.asarray(M).copy()
    off[..., 0, 0] = 0.0
    assert np.abs(off).max() < 1e-6


@pytest.fixture(scope="module")
def polarizer_file(tmp_path_factory):
    """Tabulated-frame horizontal polarizer at every configuration."""
    tmp = tmp_path_factory.mktemp("pbsdf_pol")
    P = 0.5 * np.array([
        [1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]
    ], np.float32) / np.pi
    M = np.broadcast_to(P, (NP_, ND, NH, len(WVLS), 4, 4)).copy()
    return _write(tmp, M, "polarizer.pbsdf")


def test_polarizer_physical(polarizer_file):
    """Rotated polarizer Mueller stays physical: M00 invariant, and the
    polarized output of unpolarized input satisfies |s_vec| <= s0."""
    b = MeasuredPolarizedBSDF.from_file(polarizer_file, wavelength=550.0)
    N = 512
    wi, wo = _dirs(N, 10), _dirs(N, 11)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    M, _ = b.eval_pdf_mueller(si, jnp.asarray(wo), None, 1)
    M = np.asarray(M)[:, 0]
    assert np.isfinite(M).all()
    np.testing.assert_allclose(
        M[:, 0, 0], 0.5 / np.pi * np.maximum(wo[:, 2], 0), rtol=1e-4, atol=1e-6
    )
    s = M @ np.array([1.0, 0, 0, 0], np.float32)
    mag = np.linalg.norm(s[:, 1:], axis=-1)
    assert (mag <= s[:, 0] * (1 + 1e-4) + 1e-6).all()
    # a polarizer must actually polarize: dominant configs carry |s|~s0
    good = s[:, 0] > 1e-3
    assert (mag[good] > 0.9 * s[good, 0]).all()


def test_nan_cells_zeroed(lambert_file, tmp_path):
    """NaN-encoded invalid cells must not leak into interpolated values
    (measured_polarized.cpp:285-288)."""
    phi_d, theta_d, theta_h = _grids()
    M = np.zeros((NP_, ND, NH, len(WVLS), 4, 4), np.float32)
    M[..., 0, 0] = 0.5 / np.pi
    M[..., -1, :, :, :] = np.nan  # grazing theta_h band
    fn = _write(tmp_path, M, "nan.pbsdf")
    b = MeasuredPolarizedBSDF.from_file(fn, wavelength=550.0)
    N = 512
    wi, wo = _dirs(N, 12), _dirs(N, 13)
    si = SurfaceInteraction.invalid(N).replace(wi=jnp.asarray(wi))
    ev = np.asarray(b.eval(si, jnp.asarray(wo), None, 3))
    M_, _ = b.eval_pdf_mueller(si, jnp.asarray(wo), None, 3)
    assert np.isfinite(ev).all() and np.isfinite(np.asarray(M_)).all()


def test_chi2_sampling(lambert_file):
    b = MeasuredPolarizedBSDF.from_file(lambert_file, wavelength=550.0)
    wi = np.array([0.25, -0.1, 0.96], np.float32)
    wi /= np.linalg.norm(wi)

    def sample_func(u1, u2):
        n = u1.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        )
        bs, _ = b.sample(u1, u2, si, None, 1)
        return bs.wo, bs.pdf > 0

    def pdf_func(d):
        n = d.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        )
        return b.pdf(si, d)

    t = ChiSquareTest(sample_func, pdf_func, sample_count=200_000, seed=7)
    assert t.run()


def test_loader_and_render(lambert_file):
    """measured_polarized parses from a scene dict and renders finite Stokes
    output under the polarized variant."""
    mi.set_variant("rgb_polarized")
    d = {
        "type": "scene",
        "integrator": {"type": "stokes", "nested": {"type": "path", "max_depth": 3}},
        "sensor": {
            "type": "perspective",
            "fov": 45,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 3], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "light": {"type": "point", "position": [1.0, 1.0, 2.0], "intensity": {"type": "rgb", "value": [10.0, 10.0, 10.0]}},
        "plate": {
            "type": "rectangle",
            "bsdf": {
                "type": "measured_polarized",
                "filename": lambert_file,
                "alpha_sample": 0.3,
                "wavelength": 550.0,
            },
        },
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=8))
    assert np.isfinite(img).all()
    assert img.shape[-1] >= 3
    mi.set_variant("rgb")
