"""Spectral/color handling (reference: include/mitsuba/core/spectrum.h, 541 LoC).

Variants fix the channel count C of every radiance array:
  mono      C=1
  rgb       C=3
  spectral  C=4 sampled wavelengths per lane (hero-wavelength style)

Wavelength range mirrors the reference: MI_CIE_MIN=360nm, MI_CIE_MAX=830nm
(reference: spectrum.h:126-127).  Wavelength importance sampling uses the same
reparameterized-tan pdf as the reference's sample_rgb_spectrum
(reference: spectrum.h:446 sample_rgb_spectrum / pdf_rgb_spectrum).

CIE 1931 color matching functions use the multi-lobe Gaussian fit of
Wyman, Sloan & Shirley 2013 ("Simple Analytic Approximations to the CIE XYZ
Color Matching Functions") instead of the reference's 95-entry tables — max
error < 1% of peak, and analytic = fully fused on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

CIE_MIN = 360.0
CIE_MAX = 830.0

# CIE Y integral over [360, 830] (normalization for luminance)
CIE_Y_INTEGRAL = 106.7502593994140625


def _gauss(x, alpha, mu, s1, s2):
    t = (x - mu) * jnp.where(x < mu, 1.0 / s1, 1.0 / s2)
    return alpha * jnp.exp(-0.5 * t * t)


def cie1931_xyz(wl):
    """CIE 1931 x̄,ȳ,z̄ at wavelength wl [nm] -> [..., 3] (Wyman et al. fit)."""
    x = (
        _gauss(wl, 0.362, 442.0, 16.0, 26.7)
        + _gauss(wl, 1.056, 599.8, 37.9, 31.0)
        + _gauss(wl, -0.065, 501.1, 20.4, 26.2)
    )
    y = _gauss(wl, 0.821, 568.8, 46.9, 40.5) + _gauss(wl, 0.286, 530.9, 16.3, 31.1)
    z = _gauss(wl, 1.217, 437.0, 11.8, 36.0) + _gauss(wl, 0.681, 459.0, 26.0, 13.8)
    return jnp.stack([x, y, z], axis=-1)


def cie1931_y(wl):
    return _gauss(wl, 0.821, 568.8, 46.9, 40.5) + _gauss(wl, 0.286, 530.9, 16.3, 31.1)


# sRGB (D65) <-> XYZ matrices (reference: include/mitsuba/core/transform.h srgb)
XYZ_TO_SRGB = jnp.asarray(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    jnp.float32,
)
SRGB_TO_XYZ = jnp.asarray(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    jnp.float32,
)


def xyz_to_srgb(xyz):
    return xyz @ XYZ_TO_SRGB.T


def srgb_to_xyz(rgb):
    return rgb @ SRGB_TO_XYZ.T


def luminance(rgb):
    return rgb @ jnp.asarray([0.212671, 0.715160, 0.072169], jnp.float32)


# ---------------------------------------------------------------------------
# Wavelength importance sampling (reference: spectrum.h:400-470)
# ---------------------------------------------------------------------------

def sample_visible_wavelength(u):
    """Importance-sample wl with pdf approximately proportional to the CIE
    luminous efficiency — the reference's sample_rgb_spectrum
    (spectrum.h:446): wl = 538 - atanh(0.8569 - 1.8275 u) / 0.0072."""
    wl = 538.0 - jnp.arctanh(0.8569106254698279 - 1.8275019724092267 * u) / 0.0072
    return wl


def pdf_visible_wavelength(wl):
    x = jnp.cosh(0.0072 * (wl - 538.0))
    pdf = 0.003939804229326285 / (x * x)
    inside = (wl >= CIE_MIN) & (wl <= CIE_MAX)
    return jnp.where(inside, pdf, 0.0)


def sample_uniform_wavelength(u):
    return CIE_MIN + u * (CIE_MAX - CIE_MIN)


def pdf_uniform_wavelength(wl):
    inside = (wl >= CIE_MIN) & (wl <= CIE_MAX)
    return jnp.where(inside, 1.0 / (CIE_MAX - CIE_MIN), 0.0)


def sample_wavelengths_hero(u, n=4, lo=CIE_MIN, hi=CIE_MAX):
    """Hero-wavelength sampling: one uniform u -> n stratified-rotated
    wavelengths (equally spaced modulo the range)."""
    k = jnp.arange(n, dtype=jnp.float32) / n
    t = jnp.mod(u[..., None] + k, 1.0)
    return lo + t * (hi - lo)


# ---------------------------------------------------------------------------
# Spectral upsampling of RGB reflectances
# ---------------------------------------------------------------------------

def srgb_model_eval(coeff, wl):
    """Evaluate the Jakob-Hanika 2019 sigmoid-polynomial reflectance model
    (reference: include/mitsuba/render/srgb.h srgb_model_eval):
    f(wl) = sigmoid(c0*wl^2 + c1*wl + c2)."""
    v = (coeff[..., 0:1] * wl + coeff[..., 1:2]) * wl + coeff[..., 2:3]
    v = jnp.squeeze(v, axis=-1) if v.shape[-1] == 1 and wl.ndim == coeff.ndim - 1 else v
    return 0.5 + 0.5 * v / jnp.sqrt(1.0 + v * v)


def srgb_to_spectral_coeff_approx(rgb):
    """Cheap stand-in for the rgb2spec coefficient tables: represent an RGB
    reflectance by smooth basis functions.  We use the three-Gaussian basis
    below in `rgb_reflectance_eval`; this function exists for API parity and
    returns rgb unchanged as the 'coefficients'."""
    return rgb


_RGB_BASE_MU = jnp.asarray([602.0, 540.0, 455.0], jnp.float32)
_RGB_BASE_SIG = jnp.asarray([40.0, 35.0, 28.0], jnp.float32)


def rgb_reflectance_eval(rgb, wl):
    """Smooth spectral reflectance whose sRGB projection approximates `rgb`.

    A simple smooth-basis alternative to the reference's rgb2spec tables
    (src/core/spectrum.cpp srgb upsampling): r(wl) = sum_i c_i B_i(wl) with
    normalized Gaussian bases peaking at R/G/B primaries.  Exact round-trip is
    not guaranteed (tables can replace this later); whites map to flat spectra.
    """
    wl = jnp.asarray(wl)
    b = jnp.exp(-0.5 * ((wl[..., None] - _RGB_BASE_MU) / _RGB_BASE_SIG) ** 2)
    b = b / jnp.maximum(jnp.sum(b, axis=-1, keepdims=True), 1e-6)
    return jnp.clip(jnp.sum(rgb * b, axis=-1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Blackbody (reference: src/spectra/blackbody.cpp)
# ---------------------------------------------------------------------------

def blackbody_radiance(wl_nm, temperature):
    """Planck's law, W / (m^2 sr nm)."""
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    lam = wl_nm * 1e-9
    p = 2 * h * c * c / (lam ** 5 * (jnp.exp(h * c / (lam * kb * temperature)) - 1.0))
    return p * 1e-9  # per nm


def d65_approx(wl):
    """Approximate D65 illuminant: blackbody at 6504K normalized to 1 at 560nm
    (stand-in for the reference's tabulated D65, src/spectra/d65.cpp)."""
    return blackbody_radiance(wl, 6504.0) / blackbody_radiance(
        jnp.asarray(560.0, jnp.float32), 6504.0
    )


def spectrum_to_xyz(values, wavelengths, pdf):
    """Monte-Carlo estimate of XYZ from spectral samples:
    mean over the wavelength axis of xyz(wl) * value / pdf / Y-integral.
    values/wavelengths/pdf: [..., W]."""
    xyz_w = cie1931_xyz(wavelengths)                       # [..., W, 3]
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    contrib = xyz_w * (values * w)[..., None]
    return jnp.mean(contrib, axis=-2) / CIE_Y_INTEGRAL
