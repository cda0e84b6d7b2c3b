"""NASA-layer tests: Mie solver, size distributions, tabulated polarized
phase, aerosol atmosphere rendering (BASELINE config 4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.mie import mie, mie_nmax
from mitsuba_tpu.render import sizedistr as SD
from mitsuba_tpu.render.phase_polarized import MiePhase, eval_mie_distribution


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_mie_rayleigh_limit():
    """Small-particle limit: Q_sca -> (8/3) x^4 |(m^2-1)/(m^2+2)|^2 and the
    phase matrix approaches the Rayleigh matrix."""
    lam, x, m_re = 1.0, 0.08, 1.33
    r = x * lam / (2 * np.pi)
    mus = jnp.asarray([-1.0, -0.5, 0.0, 0.5, 1.0])
    s1, s2, ns, cs, ct = mie(lam, mus, r, 1.0 + 0j, m_re + 0j, mie_nmax(1.0))
    q = float(cs[0]) / (np.pi * r**2)
    q_ray = 8 / 3 * x**4 * abs((m_re**2 - 1) / (m_re**2 + 2)) ** 2
    np.testing.assert_allclose(q, q_ray, rtol=5e-3)
    # phase shape ~ (1 + cos^2); ratio p(0)/p(1) = 0.5
    p = (np.abs(np.asarray(s1)) ** 2 + np.abs(np.asarray(s2)) ** 2) / np.asarray(ns)
    np.testing.assert_allclose(p[2] / p[4], 0.5, rtol=0.02)
    # 90-degree polarization: |S1|>>|S2| or vice versa (fully polarized)
    ratio = min(abs(complex(np.asarray(s1)[2])), abs(complex(np.asarray(s2)[2]))) / max(
        abs(complex(np.asarray(s1)[2])), abs(complex(np.asarray(s2)[2]))
    )
    assert ratio < 0.02


def test_mie_optical_theorem():
    """Extinction via the optical theorem: Ct = 4pi/k^2 * Re[i * S(0)]/...
    checked as consistency of Ct with the forward amplitude."""
    lam, x = 1.0, 6.0
    r = x / (2 * np.pi)
    s1, s2, ns, cs, ct = mie(lam, jnp.asarray(1.0), r, 1.0 + 0j, 1.33 + 0j, mie_nmax(x))
    k = 2 * np.pi / lam
    # reference amplitude scaling: S = i/kx * sum(...); optical theorem:
    # Ct = 4 pi / k * Im(S_forward_unscaled/k) -> with this scaling:
    ct_ot = 4 * np.pi / k * np.real(complex(np.asarray(s1)) * -1j) / 1.0
    np.testing.assert_allclose(float(ct), ct_ot, rtol=1e-3)


@pytest.mark.parametrize("kind", ["gamma", "lognormal", "powerlaw"])
def test_sizedistr_normalized(kind):
    if kind == "gamma":
        d = SD.GammaSizeDistr.create(1000.0, 0.25, 100.0, 5000.0, 128)
    elif kind == "lognormal":
        d = SD.LogNormalSizeDistr.create(1000.0, 1.5, 100.0, 5000.0, 128)
    else:
        d = SD.PowerLawSizeDistr.create(3.0, 100.0, 5000.0, 128)
    radii, w, vals = d.eval_gauss_all()
    integral = float(jnp.sum(w * vals))
    np.testing.assert_allclose(integral, 1.0, rtol=1e-4)
    # parameters_changed renormalizes after an edit
    if kind == "gamma":
        d2 = d.replace(a=jnp.asarray(1500.0)).parameters_changed()
        _, w2, v2 = d2.eval_gauss_all()
        np.testing.assert_allclose(float(jnp.sum(w2 * v2)), 1.0, rtol=1e-4)


def test_mie_polydisperse_phase_normalized():
    """<M00> over a gamma distribution integrates to 1 over the sphere."""
    sd = SD.GammaSizeDistr.create(800.0, 0.3, 200.0, 2000.0, 32)
    from numpy.polynomial.legendre import leggauss

    mus, ws = leggauss(128)
    M, cs_avg, ct_avg = eval_mie_distribution(
        jnp.asarray(mus, jnp.float32), 550.0, sd, 1.0 + 0j, 1.33 + 0j,
        mie_nmax(2 * np.pi * 2000 / 550.0 * 1.33),
    )
    m00 = np.asarray(M[:, 0, 0])
    integral = 2 * np.pi * (ws * m00).sum()
    np.testing.assert_allclose(integral, 1.0, rtol=5e-3)
    assert float(ct_avg) >= float(cs_avg) * 0.999


def test_baked_tabphase_sampling_consistency():
    """Baked Mie table: inverse-CDF samples reproduce the M11 density
    (lightweight chi^2)."""
    sd = SD.MonodisperseSizeDistr(radius=jnp.asarray(500.0))
    mp = MiePhase(
        size_distr=sd,
        ior_med_re=jnp.asarray(1.0), ior_med_im=jnp.asarray(0.0),
        ior_sph_re=jnp.asarray(1.33), ior_sph_im=jnp.asarray(0.0),
        wavelength=jnp.asarray(550.0),
        nmax=mie_nmax(2 * np.pi * 500 / 550 * 1.33),
    )
    tab = mp.bake(256)
    from mitsuba_tpu.core.rng import RNG

    n = 200_000
    rng = RNG(3, np.arange(n, dtype=np.uint32))
    u1, _, rng = rng.next_2d()
    a, b, _ = rng.next_2d()
    u2 = jnp.stack([a, b], axis=-1)
    wo, w, pdf = tab.sample(None, u1, u2, None, 1)
    cos = np.asarray(wo[..., 2])
    hist, edges = np.histogram(cos, bins=64, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    d = tab._distr()
    expected = np.asarray(d.eval_pdf_normalized(jnp.asarray(centers)))
    err = np.abs(hist - expected) / np.maximum(expected, 1e-2)
    assert np.median(err) < 0.1, np.median(err)
    # eval/pdf consistency at the samples
    val, pdf2 = tab.eval_pdf(None, wo, None, 1)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-5)


def test_aerosol_atmosphere_stokes_render():
    """BASELINE config 4: spectral/mono polarized atmosphere with Rayleigh +
    Mie aerosol (size distribution), directional sun, Stokes output."""
    mi.set_variant("mono_polarized")
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 8},
        "sun": {"type": "directional", "direction": [0.3, 0, -1], "irradiance": 10.0},
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [50.0, 50.0, 1.0]}],
            "bsdf": {"type": "null"},
            "interior": {"type": "ref", "id": "atmo"},
        },
        "atmo": {
            "type": "homogeneous",
            "sigma_t": 0.1,
            "albedo": 0.95,
            "phase": {
                "type": "blendphase",
                "weight": 0.4,
                "rayleigh_part": {"type": "rayleigh", "depolarization": 0.03},
                "aerosol": {
                    "type": "mie",
                    "wavelength": 550.0,
                    "ior_sph": 1.33,
                    "size_distr": {
                        "type": "gamma", "a": 600.0, "b": 0.3,
                        "min_radius": 200.0, "max_radius": 1500.0,
                        "gauss_points": 24,
                    },
                    "bake_nodes": 128,
                },
            },
        },
        "sensor": {
            "type": "radiancemeter",
            "wavelength": 550.0,
            "to_world": [
                {"type": "look_at", "origin": [-60.0, 0.0, 0.0], "target": [1, 0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 4, "height": 4, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 64},
        },
    }
    scene = mi.load_dict(d)
    spec = np.asarray(mi.render_1(scene, spp=1024))
    mi.set_variant("rgb")
    assert spec.shape == (4, 1)
    I, Q, U, V = spec[:, 0]
    assert np.isfinite(spec).all()
    assert I > 0
    dolp = np.sqrt(Q**2 + U**2 + V**2) / I
    assert 0.0 < dolp < 1.0   # partially polarized skylight
