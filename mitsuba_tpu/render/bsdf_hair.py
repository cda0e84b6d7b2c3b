"""Hair fiber BSDF (reference: src/bsdfs/hair.cpp; Chiang et al. 2016,
"A Practical and Controllable Hair and Fur Model for Production Path
Tracing").

Near-field fiber scattering: one interaction encapsulates the whole walk
through the fiber, decomposed by internal segment count p (R, TT, TRT,
residual).  Local frame convention matches the reference: the fiber tangent
is the local +y axis (w.y = sin(theta_longitudinal)); the azimuthal angle is
atan2(w.z, w.x).

Longitudinal lobes use the energy-conserving d'Eon et al. 2011 density
(warp.h square_to_rough_fiber_pdf) with the numerically-robust log-space
Bessel form; azimuthal lobes use trimmed logistics around the perfect
specular offsets.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import spectrum as spec
from .records import BSDFSample

P_MAX = 3

# d'Eon et al. 2011 pigment absorption coefficients (per unit hair radius)
EUMELANIN_SIGMA_A = (0.419, 0.697, 1.37)
PHEOMELANIN_SIGMA_A = (0.187, 0.4, 1.05)


def _i0(x):
    """Modified Bessel I0 (Abramowitz & Stegun 9.8.1/9.8.2 polynomials)."""
    ax = jnp.abs(x)
    t = ax / 3.75
    small = (
        1.0 + 3.5156229 * t**2 + 3.0899424 * t**4 + 1.2067492 * t**6
        + 0.2659732 * t**8 + 0.0360768 * t**10 + 0.0045813 * t**12
    )
    ti = jnp.where(ax > 1e-8, 3.75 / jnp.maximum(ax, 1e-8), 1.0)
    big = (
        jnp.exp(ax) / jnp.sqrt(jnp.maximum(ax, 1e-8))
        * (0.39894228 + 0.01328592 * ti + 0.00225319 * ti**2
           - 0.00157565 * ti**3 + 0.00916281 * ti**4 - 0.02057706 * ti**5
           + 0.02635537 * ti**6 - 0.01647633 * ti**7 + 0.00392377 * ti**8)
    )
    return jnp.where(ax <= 3.75, small, big)


def _log_i0(x):
    ax = jnp.abs(x)
    return jnp.where(
        ax > 12.0,
        ax + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / jnp.maximum(ax, 1e-8)) + 1.0 / (8.0 * jnp.maximum(ax, 1e-8))),
        jnp.log(_i0(jnp.minimum(ax, 12.0))),
    )


def rough_fiber_pdf(v_dir, wi, kappa):
    """d'Eon longitudinal density around the +y tangent
    (reference: warp.h:771-793 square_to_rough_fiber_pdf)."""
    sin_theta_i = wi[..., 1]
    sin_theta_o = v_dir[..., 1]
    cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i**2, 0.0))
    cos_theta_o = jnp.sqrt(jnp.maximum(1.0 - sin_theta_o**2, 0.0))
    c = cos_theta_i * cos_theta_o * kappa
    s = sin_theta_i * sin_theta_o * kappa
    inv_two_pi = 0.5 / jnp.pi
    robust = jnp.exp(
        -s + _log_i0(c) - kappa + 0.6931 + jnp.log(0.5 * kappa)
    ) * inv_two_pi
    direct = jnp.exp(-s) * _i0(c) * kappa / (2.0 * jnp.sinh(kappa)) * inv_two_pi
    return jnp.where(kappa > 10.0, robust, direct)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic_sample(u, s):
    k = _logistic_cdf(jnp.pi, s) - _logistic_cdf(-jnp.pi, s)
    x = -s * jnp.log(
        1.0 / jnp.maximum(u * k + _logistic_cdf(-jnp.pi, s), 1e-20) - 1.0
    )
    return jnp.clip(x, -jnp.pi, jnp.pi)


def _fresnel_scalar(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance for a dielectric."""
    c = jnp.clip(cos_theta_i, -1.0, 1.0)
    sin2_t = jnp.maximum(1.0 - c * c, 0.0) / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_s = (c - eta * cos_t) / jnp.maximum(c + eta * cos_t, 1e-9)
    r_p = (eta * c - cos_t) / jnp.maximum(eta * c + cos_t, 1e-9)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f)


@struct.dataclass
class HairBSDF:
    """(reference: src/bsdfs/hair.cpp:135-793)."""

    longitudinal_roughness: jnp.ndarray
    azimuthal_roughness: jnp.ndarray
    alpha: jnp.ndarray               # scale tilt, degrees
    eta: jnp.ndarray
    eumelanin: jnp.ndarray
    pheomelanin: jnp.ndarray
    sigma_a: object = None           # texture, or None -> pigmentation
    scale: jnp.ndarray = 1.0

    flags_smooth = True
    flags_transmission = True

    # -- derived state (hair.cpp update()) ---------------------------------
    def _v(self):
        br = self.longitudinal_roughness
        v0 = (0.726 * br + 0.812 * br**2 + 3.7 * br**20) ** 2
        return (v0, 0.25 * v0, 4.0 * v0, 4.0 * v0)

    def _s(self):
        ar = self.azimuthal_roughness
        return jnp.sqrt(jnp.pi / 8.0) * (
            0.265 * ar + 1.194 * ar**2 + 5.372 * ar**22
        )

    def _sin_cos_2k_alpha(self):
        sin0 = jnp.sin(jnp.deg2rad(self.alpha))
        cos0 = jnp.sqrt(jnp.maximum(1.0 - sin0**2, 0.0))
        sin1 = 2.0 * cos0 * sin0
        cos1 = cos0**2 - sin0**2
        sin2 = 2.0 * cos1 * sin1
        cos2 = cos1**2 - sin1**2
        return (sin0, sin1, sin2), (cos0, cos1, cos2)

    def _reframe(self, sin_theta_i, cos_theta_i, p):
        (s0, s1, s2), (c0, c1, c2) = self._sin_cos_2k_alpha()
        if p == 0:
            st = sin_theta_i * c1 - cos_theta_i * s1
            ct = cos_theta_i * c1 + sin_theta_i * s1
        elif p == 1:
            st = sin_theta_i * c0 + cos_theta_i * s0
            ct = cos_theta_i * c0 - sin_theta_i * s0
        elif p == 2:
            st = sin_theta_i * c2 + cos_theta_i * s2
            ct = cos_theta_i * c2 - sin_theta_i * s2
        else:
            st, ct = sin_theta_i, cos_theta_i
        return st, jnp.abs(ct)

    # -- geometry helpers ---------------------------------------------------
    @staticmethod
    def _gamma(w):
        proj = jnp.sqrt(jnp.maximum(w[..., 0] ** 2 + w[..., 2] ** 2, 0.0))
        g = jnp.arccos(
            jnp.clip(w[..., 2] / jnp.maximum(proj, 1e-12), -1.0, 1.0)
        )
        g = jnp.where(proj == 0.0, 0.0, g)
        return jnp.where(w[..., 0] < 0, g, -g)

    def _absorption(self, si, wavelengths, n_channels):
        if self.sigma_a is not None:
            return self.scale * self.sigma_a.eval(si.uv, wavelengths, n_channels)
        eu = jnp.asarray(EUMELANIN_SIGMA_A, jnp.float32)
        ph = jnp.asarray(PHEOMELANIN_SIGMA_A, jnp.float32)
        if n_channels == 3:
            return self.eumelanin * eu + self.pheomelanin * ph
        if n_channels == 1:
            return (
                self.eumelanin * spec.luminance(eu)
                + self.pheomelanin * spec.luminance(ph)
            )[None]
        coeff_eu = spec.srgb_to_spectral_coeff(eu)
        coeff_ph = spec.srgb_to_spectral_coeff(ph)
        return self.eumelanin * spec.srgb_model_eval(
            coeff_eu, wavelengths
        ) + self.pheomelanin * spec.srgb_model_eval(coeff_ph, wavelengths)

    def _attenuation(self, cos_theta_i, h, transmittance):
        cos_gamma_i = jnp.sqrt(jnp.maximum(1.0 - h * h, 0.0))
        cos_theta = cos_theta_i * cos_gamma_i
        f = _fresnel_scalar(cos_theta, self.eta)[..., None]
        a = [f, (1.0 - f) ** 2 * transmittance]
        for p in range(2, P_MAX):
            a.append(a[p - 1] * transmittance * f)
        a.append(
            a[P_MAX - 1] * f * transmittance
            / jnp.maximum(1.0 - transmittance * f, 1e-5)
        )
        return a            # list of [N, C], length P_MAX+1

    def _common(self, si, wavelengths, n_channels):
        wi = si.wi
        gamma_i = self._gamma(wi)
        h = jnp.sin(gamma_i)
        sin_theta_i = wi[..., 1]
        cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i**2, 0.0))
        sin_theta_t = sin_theta_i / self.eta
        cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t**2, 0.0))
        eta_p = jnp.sqrt(
            jnp.maximum(self.eta**2 - sin_theta_i**2, 0.0)
        ) / jnp.maximum(cos_theta_i, 1e-9)
        sin_gamma_t = h / eta_p
        cos_gamma_t = jnp.sqrt(jnp.maximum(1.0 - sin_gamma_t**2, 0.0))
        gamma_t = jnp.arcsin(jnp.clip(sin_gamma_t, -1.0, 1.0))
        sigma_a = self._absorption(si, wavelengths, n_channels)
        length = 2.0 * cos_gamma_t / jnp.maximum(cos_theta_t, 1e-9)
        transmittance = jnp.exp(-sigma_a * length[..., None])
        a_p = self._attenuation(cos_theta_i, h, transmittance)
        lum = [jnp.mean(a, axis=-1) for a in a_p]
        total = jnp.maximum(sum(lum), 1e-20)
        a_p_pdf = [l / total for l in lum]
        return dict(
            gamma_i=gamma_i, h=h, sin_theta_i=sin_theta_i,
            cos_theta_i=cos_theta_i, gamma_t=gamma_t, a_p=a_p,
            a_p_pdf=a_p_pdf,
        )

    def _azimuthal(self, delta_phi, p, gamma_i, gamma_t):
        s = self._s()
        perfect = 2.0 * p * gamma_t - 2.0 * gamma_i + p * jnp.pi
        phi = delta_phi - perfect
        phi = jnp.mod(phi, 2.0 * jnp.pi)
        phi = jnp.where(phi < jnp.pi, phi + 2.0 * jnp.pi, phi)
        phi = jnp.where(phi > jnp.pi, phi - 2.0 * jnp.pi, phi)
        k = _logistic_cdf(jnp.pi, s) - _logistic_cdf(-jnp.pi, s)
        return _logistic(phi, s) / k

    def _eval_pdf(self, si, wo, wavelengths, n_channels):
        wi = si.wi
        C = self._common(si, wavelengths, n_channels)
        v = self._v()
        phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])
        cos_phi_i = jnp.cos(phi_i)
        sin_phi_i = jnp.sin(phi_i)
        phi_o = jnp.arctan2(wo[..., 2], wo[..., 0])
        delta_phi = phi_o - phi_i

        pdf = 0.0
        value = 0.0
        for p in range(P_MAX):
            st_ip, ct_ip = self._reframe(C["sin_theta_i"], C["cos_theta_i"], p)
            wi_p = jnp.stack(
                [ct_ip * cos_phi_i, st_ip, ct_ip * sin_phi_i], axis=-1
            )
            longi = rough_fiber_pdf(wo, wi_p, 1.0 / v[p])
            azi = self._azimuthal(delta_phi, p, C["gamma_i"], C["gamma_t"])
            pdf = pdf + longi * 2.0 * jnp.pi * C["a_p_pdf"][p] * azi
            value = value + (longi * 2.0 * jnp.pi * azi)[..., None] * C["a_p"][p]
        longi = rough_fiber_pdf(wo, wi, 1.0 / v[P_MAX])
        pdf = pdf + longi * C["a_p_pdf"][P_MAX]
        value = value + longi[..., None] * C["a_p"][P_MAX]
        bad_p = jnp.isnan(pdf) | jnp.isinf(pdf)
        bad_v = jnp.any(jnp.isnan(value) | jnp.isinf(value), axis=-1)
        return (
            jnp.where((bad_v | bad_p)[..., None], 0.0, value),
            jnp.where(bad_p | bad_v, 0.0, pdf),
        )

    def eval(self, si, wo, wavelengths, n_channels):
        return self._eval_pdf(si, wo, wavelengths, n_channels)[0]

    def pdf(self, si, wo):
        return self._eval_pdf(si, wo, None, 3)[1]

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        wi = si.wi
        C = self._common(si, wavelengths, n_channels)
        v = self._v()
        phi_i = jnp.arctan2(wi[..., 2], wi[..., 0])

        # segment selection by luminance pdf, with random-number reuse
        # (hair.cpp:249-262)
        u00 = u_lobe
        p_sel = jnp.zeros(u00.shape, jnp.int32)
        u01 = u00 / jnp.maximum(C["a_p_pdf"][0], 1e-20)
        for i in range(P_MAX):
            take = C["a_p_pdf"][i] < u00
            u00 = u00 - C["a_p_pdf"][i]
            p_sel = jnp.where(take, i + 1, p_sel)
            u01 = jnp.where(
                take, u00 / jnp.maximum(C["a_p_pdf"][i + 1], 1e-20), u01
            )
        u01 = jnp.clip(u01, 0.0, 1.0 - 1e-6)

        # scale-tilted incident frame for the selected p
        st_ip = C["sin_theta_i"]
        ct_ip = C["cos_theta_i"]
        for j in range(P_MAX):
            st_j, ct_j = self._reframe(C["sin_theta_i"], C["cos_theta_i"], j)
            st_ip = jnp.where(p_sel == j, st_j, st_ip)
            ct_ip = jnp.where(p_sel == j, ct_j, ct_ip)

        # longitudinal sampling (hair.cpp:275-284)
        v_sel = v[P_MAX] * jnp.ones_like(u00)
        for i in range(P_MAX):
            v_sel = jnp.where(p_sel == i, v[i], v_sel)
        cos_theta = 1.0 + v_sel * jnp.log(
            jnp.maximum(u2[..., 0] + (1.0 - u2[..., 0]) * jnp.exp(-2.0 / v_sel), 1e-38)
        )
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
        cos_phi = jnp.cos(2.0 * jnp.pi * u2[..., 1])
        sin_theta_o = -cos_theta * st_ip + sin_theta * cos_phi * ct_ip
        cos_theta_o = jnp.sqrt(jnp.maximum(1.0 - sin_theta_o**2, 0.0))

        # azimuthal sampling
        perfect = (
            2.0 * p_sel * C["gamma_t"] - 2.0 * C["gamma_i"] + p_sel * jnp.pi
        )
        s = self._s()
        delta_first = perfect + _trimmed_logistic_sample(u01, s)
        delta_rest = 2.0 * jnp.pi * u01
        delta_phi = jnp.where(p_sel < P_MAX, delta_first, delta_rest)

        phi_o = phi_i + delta_phi
        wo = jnp.stack(
            [
                cos_theta_o * jnp.cos(phi_o),
                sin_theta_o,
                cos_theta_o * jnp.sin(phi_o),
            ],
            axis=-1,
        )
        wo = wo / jnp.maximum(
            jnp.linalg.norm(wo, axis=-1, keepdims=True), 1e-12
        )

        value, pdf = self._eval_pdf(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (pdf > 0)[..., None], value / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros(pdf.shape, bool),
        )
        return bs, weight
