"""Spectral/color handling (reference: include/mitsuba/core/spectrum.h, 541 LoC).

Variants fix the channel count C of every radiance array:
  mono      C=1
  rgb       C=3
  spectral  C=4 sampled wavelengths per lane (hero-wavelength style)

Wavelength range mirrors the reference: MI_CIE_MIN=360nm, MI_CIE_MAX=830nm
(reference: spectrum.h:126-127).  Wavelength importance sampling uses the same
reparameterized-tan pdf as the reference's sample_rgb_spectrum
(reference: spectrum.h:446 sample_rgb_spectrum / pdf_rgb_spectrum).

CIE 1931 color matching functions and the D65 illuminant use the standard
95-entry tables at 5nm spacing (the same public colorimetric data as
spectrum.cpp:158 / spectrum.h:138), linearly interpolated.  RGB->spectrum
upsampling uses the Jakob & Hanika 2019 sigmoid-polynomial coefficient
table in data/srgb64.coeff, generated offline with the reference's
ext/rgb2spec/rgb2spec_opt.cpp optimizer (sRGB gamut, resolution 64).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")
_CIE_TBL = jnp.asarray(np.load(os.path.join(_DATA_DIR, "cie1931.npy")))   # [3, 95]
_D65_TBL_NP = np.load(os.path.join(_DATA_DIR, "d65.npy"))                 # [95]
_D65_TBL = jnp.asarray(_D65_TBL_NP / np.interp(560.0, np.arange(360, 831, 5), _D65_TBL_NP))

CIE_MIN = 360.0
CIE_MAX = 830.0

# CIE Y integral over [360, 830] (normalization for luminance)
CIE_Y_INTEGRAL = 106.7502593994140625


def _cie_interp(tbl, wl):
    """Linear interpolation of a [.., 95] table over [360, 830] at 5nm; zero
    outside the range (reference: cie1931_xyz, spectrum.h:210-260)."""
    t = (wl - CIE_MIN) / 5.0
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, 93)
    f = jnp.clip(t - i, 0.0, 1.0)
    v = tbl[..., i] * (1.0 - f) + tbl[..., i + 1] * f
    inside = (wl >= CIE_MIN) & (wl <= CIE_MAX)
    return jnp.where(inside, v, 0.0)


def cie1931_xyz(wl):
    """CIE 1931 x̄,ȳ,z̄ at wavelength wl [nm] -> [..., 3] (tabulated standard
    observer, 5nm steps; reference: spectrum.cpp:158 cie1931_tbl)."""
    return jnp.moveaxis(_cie_interp(_CIE_TBL, wl), 0, -1)


def cie1931_y(wl):
    return _cie_interp(_CIE_TBL[1], wl)


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
    f(wl) = sigmoid(c0*wl^2 + c1*wl + c2), with c2 = +-inf encoding the
    monochromatic 0/1 extremes."""
    v = (coeff[..., 0] * wl + coeff[..., 1]) * wl + coeff[..., 2]
    out = jnp.maximum(0.0, 0.5 + 0.5 * v / jnp.sqrt(1.0 + v * v))
    lim = jnp.where(jnp.sign(v) > 0, 1.0, 0.0)
    return jnp.where(jnp.isinf(v), lim, out)


_RGB2SPEC = None


def _rgb2spec_tables():
    """Lazy-load the sRGB coefficient table (data/srgb64.coeff, generated
    with the reference's ext/rgb2spec/rgb2spec_opt.cpp: './rgb2spec_opt 64
    srgb64.coeff sRGB')."""
    global _RGB2SPEC
    if _RGB2SPEC is None:
        fn = os.path.join(_DATA_DIR, "srgb64.coeff")
        with open(fn, "rb") as f:
            buf = f.read()
        assert buf[:4] == b"SPEC"
        res = int(np.frombuffer(buf, np.uint32, 1, 4)[0])
        scale = np.frombuffer(buf, np.float32, res, 8)
        data = np.frombuffer(buf, np.float32, 3 * res**3 * 3, 8 + 4 * res)
        # cache NUMPY (not jnp): a jnp constant materialized inside a jit
        # trace is a tracer in the stackless regime and would leak into
        # later traces (UnexpectedTracerError)
        _RGB2SPEC = (scale.copy(), data.reshape(3, res, res, res, 3).copy(), res)
    scale, data, res = _RGB2SPEC
    return jnp.asarray(scale), jnp.asarray(data), res


def srgb_to_spectral_coeff(rgb):
    """RGB -> sigmoid-polynomial coefficients via trilinear table fetch
    (reference: ext/rgb2spec/rgb2spec.c rgb2spec_fetch).  rgb: [..., 3];
    returns [..., 3] coefficients for srgb_model_eval."""
    scale, data, res = _rgb2spec_tables()
    rgb = jnp.clip(rgb, 0.0, 1.0)
    i = jnp.argmax(rgb, axis=-1)
    z = jnp.take_along_axis(rgb, i[..., None], axis=-1)[..., 0]
    zs = jnp.maximum(z, 1e-10)
    sc = (res - 1) / zs
    x = jnp.take_along_axis(rgb, ((i + 1) % 3)[..., None], axis=-1)[..., 0] * sc
    y = jnp.take_along_axis(rgb, ((i + 2) % 3)[..., None], axis=-1)[..., 0] * sc
    xi = jnp.clip(x.astype(jnp.int32), 0, res - 2)
    yi = jnp.clip(y.astype(jnp.int32), 0, res - 2)
    zi = jnp.clip(jnp.searchsorted(scale, z, side="right") - 1, 0, res - 2)
    x1 = x - xi
    y1 = y - yi
    z1 = (z - scale[zi]) / jnp.maximum(scale[zi + 1] - scale[zi], 1e-20)

    flat = data.reshape(-1, 3)
    base = ((i * res + zi) * res + yi) * res + xi

    def corner(dz, dy, dx):
        idx = base + (dz * res + dy) * res + dx
        return flat[idx]

    w = lambda a, b: jnp.where(b, a, 1.0 - a)[..., None]
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out = out + corner(dz, dy, dx) * (
                    w(z1, dz) * w(y1, dy) * w(x1, dx)
                )

    # monochromatic case, solved analytically (rgb2spec.c:84-98)
    mono = (rgb[..., 0] == rgb[..., 1]) & (rgb[..., 1] == rgb[..., 2])
    v = rgb[..., 0]
    r = jnp.where(
        v <= 0.0,
        -jnp.inf,
        jnp.where(
            v >= 1.0,
            jnp.inf,
            (v - 0.5) / jnp.sqrt(jnp.maximum(v * (1.0 - v), 1e-20)),
        ),
    )
    mono_c = jnp.stack([jnp.zeros_like(r), jnp.zeros_like(r), r], axis=-1)
    return jnp.where(mono[..., None], mono_c, out)


def srgb_to_spectral_coeff_approx(rgb):
    """Backwards-compatible alias (the coefficients are now exact rgb2spec
    table fetches, not an approximation)."""
    return srgb_to_spectral_coeff(rgb)


def rgb_reflectance_eval(rgb, wl):
    """Spectral reflectance whose sRGB projection reproduces `rgb` under D65
    (the reference's round-trip property; spectrum.h:446, srgb.h).
    rgb: [..., 3] broadcastable against wl [...]."""
    coeff = srgb_to_spectral_coeff(rgb)
    return srgb_model_eval(coeff, jnp.asarray(wl))


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


# D65 scaled so that integrating L(wl)*ybar(wl)/CIE_Y_INTEGRAL gives Y = 1:
# an rgb (1,1,1) emitter then has unit luminance (reference: d65.cpp
# MI_CIE_D65_NORMALIZATION)
_D65_Y = float(
    np.trapezoid(
        np.asarray(_D65_TBL) * np.load(os.path.join(_DATA_DIR, "cie1931.npy"))[1],
        dx=5.0,
    )
    / CIE_Y_INTEGRAL
)


def rgb_emission_eval(rgb, wl):
    """Emissive rgb -> spectral radiance: normalize so the largest component
    is 0.5, upsample, multiply by the D65 illuminant and the scale back
    (reference: d65.cpp:95-108 + xml.cpp create_texture_from_rgb within
    emitters).  rgb: [..., 3] broadcastable against wl [...]."""
    factor = jnp.max(rgb, axis=-1, keepdims=True) * 2.0
    norm = rgb / jnp.maximum(factor, 1e-20)
    model = rgb_reflectance_eval(jnp.where(factor > 0, norm, 0.0), wl)
    d65 = d65_eval(jnp.asarray(wl)) / _D65_Y
    f = factor[..., 0] if factor.shape[-1] == 1 and model.ndim == factor.ndim - 1 else factor
    return model * d65 * f


def d65_eval(wl):
    """CIE standard illuminant D65 (tabulated, 5nm; reference:
    spectrum.h:138 d65_table), normalized to 1 at 560nm."""
    return _cie_interp(_D65_TBL, wl)


# backwards-compatible alias (now the tabulated standard illuminant)
d65_approx = d65_eval


def spectrum_to_xyz(values, wavelengths, pdf):
    """Monte-Carlo estimate of XYZ from spectral samples:
    mean over the wavelength axis of xyz(wl) * value / pdf / Y-integral.
    values/wavelengths/pdf: [..., W]."""
    xyz_w = cie1931_xyz(wavelengths)                       # [..., W, 3]
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    contrib = xyz_w * (values * w)[..., None]
    return jnp.mean(contrib, axis=-2) / CIE_Y_INTEGRAL
