"""Fresnel equations, real and polarized/complex.

TPU-native equivalent of reference include/mitsuba/render/fresnel.h.
Semantics mirrored exactly (Verdet sign convention for a_p, negative-kappa
convention flip, TIR phase from the complex square root — fresnel.h:148-273).
Complex arithmetic uses jnp.complex64; XLA decomposes it into real VPU ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import safe_sqrt


def fresnel(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance at a real dielectric interface.

    Mirrors mi::fresnel (fresnel.h:34-90).  Returns (F, cos_theta_t, eta_it,
    eta_ti); eta is the relative IOR (inside/outside); cos_theta_i signed
    (positive = outside)."""
    eta = jnp.asarray(eta, jnp.float32)
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    cos_theta_t_sqr = 1.0 - eta_ti * eta_ti * (1.0 - cos_theta_i * cos_theta_i)
    cos_theta_i_abs = jnp.abs(cos_theta_i)
    cos_theta_t_abs = safe_sqrt(cos_theta_t_sqr)

    index_matched = eta == 1.0
    tir = cos_theta_t_sqr <= 0.0

    a_s = (cos_theta_i_abs - eta_it * cos_theta_t_abs) / jnp.maximum(
        cos_theta_i_abs + eta_it * cos_theta_t_abs, 1e-12
    )
    a_p = (eta_it * cos_theta_i_abs - cos_theta_t_abs) / jnp.maximum(
        eta_it * cos_theta_i_abs + cos_theta_t_abs, 1e-12
    )

    r = 0.5 * (a_s * a_s + a_p * a_p)
    r = jnp.where(index_matched, 0.0, jnp.where(tir, 1.0, r))
    cos_theta_t = jnp.where(tir, 0.0, -jnp.sign(cos_theta_i) * cos_theta_t_abs)
    return r, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta, k):
    """Unpolarized Fresnel reflectance of a conductor with complex IOR
    eta - i k (mirrors mi::fresnel_conductor, fresnel.h:92-146)."""
    cos_theta_i_2 = cos_theta_i * cos_theta_i
    sin_theta_i_2 = 1.0 - cos_theta_i_2
    sin_theta_i_4 = sin_theta_i_2 * sin_theta_i_2

    eta_2 = eta * eta
    k_2 = k * k

    temp_1 = eta_2 - k_2 - sin_theta_i_2
    a_2_pb_2 = safe_sqrt(temp_1 * temp_1 + 4.0 * eta_2 * k_2)
    a = safe_sqrt(0.5 * (a_2_pb_2 + temp_1))

    term_1 = a_2_pb_2 + cos_theta_i_2
    term_2 = 2.0 * a * cos_theta_i
    r_s = (term_1 - term_2) / jnp.maximum(term_1 + term_2, 1e-12)

    term_3 = a_2_pb_2 * cos_theta_i_2 + sin_theta_i_4
    term_4 = term_2 * sin_theta_i_2
    r_p = r_s * (term_3 - term_4) / jnp.maximum(term_3 + term_4, 1e-12)

    return 0.5 * (r_s + r_p)


def _mulsign_c(z, s):
    return jnp.where(s >= 0, z, -z)


def fresnel_polarized(cos_theta_i, eta):
    """Complex polarized Fresnel amplitudes (Verdet convention).

    Mirrors mi::fresnel_polarized for complex eta (fresnel.h:225-273); a real
    eta input handles the dielectric case incl. TIR phase.  Returns
    (a_s, a_p, cos_theta_t_signed, eta_it, eta_ti) with a_s/a_p complex64."""
    eta = jnp.asarray(eta, jnp.complex64)
    # flip kappa sign convention (fresnel.h:231-233)
    eta = jnp.where(jnp.imag(eta) > 0, jnp.conj(eta), eta)

    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    cos_theta_t_sqr = 1.0 - eta_ti * eta_ti * (1.0 - cos_theta_i * cos_theta_i).astype(
        jnp.complex64
    )
    cos_theta_i_abs = jnp.abs(cos_theta_i)
    cos_theta_t = jnp.sqrt(cos_theta_t_sqr)
    # sign of root per Clarke "Stellar Polarimetry" A.2 (fresnel.h:247-250)
    cos_theta_t = _mulsign_c(cos_theta_t, jnp.real(cos_theta_t_sqr))

    a_s = (cos_theta_i_abs - eta_it * cos_theta_t) / (
        cos_theta_i_abs + eta_it * cos_theta_t
    )
    a_p = (eta_it * cos_theta_i_abs - cos_theta_t) / (
        eta_it * cos_theta_i_abs + cos_theta_t
    )

    sq_norm = jnp.real(eta) ** 2 + jnp.imag(eta) ** 2
    index_matched = (sq_norm == 1.0) & (jnp.imag(eta) == 0.0)
    invalid = sq_norm == 0.0
    bad = index_matched | invalid
    a_s = jnp.where(bad, 0.0, a_s)
    a_p = jnp.where(bad, 0.0, a_p)

    cos_theta_t_signed = jnp.where(
        jnp.real(cos_theta_t_sqr) >= 0.0,
        -jnp.sign(cos_theta_i) * jnp.abs(jnp.real(cos_theta_t)),
        0.0,
    )
    return a_s, a_p, cos_theta_t_signed, eta_it, eta_ti


def fresnel_diffuse_reflectance(eta):
    """Polynomial fit of the diffuse (hemispherical) Fresnel reflectance
    (mirrors mi::fresnel_diffuse_reflectance, fresnel.h:310+)."""
    eta = jnp.asarray(eta, jnp.float32)
    inv_eta = 1.0 / eta
    # Egan & Hilgeman (1973) fit, used for eta < 1 (fresnel.h:341-343)
    approx_lo = -1.4399 * eta * eta + 0.7099 * eta + 0.6681 + 0.0636 * inv_eta
    inv_eta_2 = inv_eta * inv_eta
    inv_eta_3 = inv_eta_2 * inv_eta
    inv_eta_4 = inv_eta_3 * inv_eta
    inv_eta_5 = inv_eta_4 * inv_eta
    approx_hi = (
        0.919317 - 3.4793 * inv_eta + 6.75335 * inv_eta_2 - 7.80989 * inv_eta_3 + 4.98554 * inv_eta_4 - 1.36881 * inv_eta_5
    )
    return jnp.where(eta < 1.0, approx_lo, approx_hi)
