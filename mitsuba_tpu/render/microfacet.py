"""Microfacet distributions (reference: include/mitsuba/render/microfacet.h).

GGX and Beckmann with Smith shadowing and visible-normal sampling (VNDF,
Heitz 2018 for GGX).  All functions work on local-frame unit vectors [N, 3].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import normalize
from ..core.math import INV_PI, TWO_PI, safe_sqrt


def ggx_d(m, alpha_u, alpha_v):
    """GGX normal distribution function D(m)."""
    cos2 = m[..., 2] ** 2
    e = (m[..., 0] ** 2 / (alpha_u**2) + m[..., 1] ** 2 / (alpha_v**2) + cos2)
    d = 1.0 / (jnp.pi * alpha_u * alpha_v * e * e)
    return jnp.where(m[..., 2] > 0, d, 0.0)


def beckmann_d(m, alpha_u, alpha_v):
    cos2 = m[..., 2] ** 2
    d = jnp.exp(
        -(m[..., 0] ** 2 / (alpha_u**2) + m[..., 1] ** 2 / (alpha_v**2)) / jnp.maximum(cos2, 1e-9)
    ) / (jnp.pi * alpha_u * alpha_v * jnp.maximum(cos2, 1e-9) ** 2)
    return jnp.where(m[..., 2] > 0, d, 0.0)


def smith_g1_ggx(v, m, alpha_u, alpha_v):
    """Smith mono-directional shadowing for GGX (microfacet.h smith_g1)."""
    xy_alpha_2 = (alpha_u * v[..., 0]) ** 2 + (alpha_v * v[..., 1]) ** 2
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(v[..., 2] ** 2, 1e-12)
    result = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
    # perpendicular incidence / backfacing w.r.t. m
    back = jnp.sum(v * m, axis=-1) * v[..., 2] <= 0.0
    return jnp.where(back, 0.0, result)


def ggx_sample_vndf(wi, u1, u2, alpha_u, alpha_v):
    """Sample the GGX distribution of visible normals (Heitz 2018), as the
    reference's MicrofacetDistribution::sample with sample_visible=true."""
    # stretch
    v = normalize(
        jnp.stack([alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], axis=-1)
    )
    v = jnp.where(v[..., 2:3] < 0, -v, v)
    # orthonormal basis around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v.dtype), v.shape),
    )
    t2 = jnp.cross(v, t1)
    # parameterization of the projected area
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    n = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    # unstretch
    m = normalize(
        jnp.stack(
            [alpha_u * n[..., 0], alpha_v * n[..., 1], jnp.maximum(n[..., 2], 1e-6)],
            axis=-1,
        )
    )
    return m


def ggx_pdf_visible(wi, m, alpha_u, alpha_v):
    """pdf of ggx_sample_vndf: G1(wi) * |wi.m| * D(m) / |cos_theta_i|."""
    g1 = smith_g1_ggx(wi, m, alpha_u, alpha_v)
    d = ggx_d(m, alpha_u, alpha_v)
    return g1 * jnp.abs(jnp.sum(wi * m, axis=-1)) * d / jnp.maximum(
        jnp.abs(wi[..., 2]), 1e-9
    )


def ggx_g(wi, wo, m, alpha_u, alpha_v):
    return smith_g1_ggx(wi, m, alpha_u, alpha_v) * smith_g1_ggx(wo, m, alpha_u, alpha_v)


# ---------------------------------------------------------------------------
# GTR1 (Berry) distribution — the principled BSDF's clearcoat lobe
# (reference: src/bsdfs/principledhelpers.h GTR1Isotropic)
# ---------------------------------------------------------------------------

def gtr1_d(m, alpha):
    """GTR1 normal distribution (principledhelpers.h:32-40)."""
    cos2 = m[..., 2] ** 2
    a2 = alpha * alpha
    res = (a2 - 1.0) / (jnp.pi * jnp.log(a2) * (1.0 + (a2 - 1.0) * cos2))
    return jnp.where(res * m[..., 2] > 1e-20, res, 0.0)


def gtr1_pdf(m, alpha):
    """Plain (non-visible) NDF sampling pdf: cos_theta * D (…:42-44)."""
    return jnp.where(m[..., 2] < 0.0, 0.0, m[..., 2] * gtr1_d(m, alpha))


def gtr1_sample(u1, u2, alpha):
    """Inverse-CDF sample of GTR1 (…:46-57)."""
    phi = TWO_PI * u1
    a2 = alpha * alpha
    cos2 = (1.0 - jnp.power(a2, 1.0 - u2)) / (1.0 - a2)
    sin_t = safe_sqrt(1.0 - cos2)
    cos_t = safe_sqrt(cos2)
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def smith_ggx1(v, m, alpha):
    """Separable Smith G1 used by the clearcoat lobe
    (principledhelpers.h:93-111)."""
    a2 = alpha * alpha
    cos_t = jnp.abs(v[..., 2])
    cos2 = cos_t * cos_t
    tan2 = (1.0 - cos2) / jnp.maximum(cos2, 1e-12)
    res = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))
    res = jnp.where(v[..., 2] == 1.0, 1.0, res)
    back = jnp.sum(v * m, axis=-1) * v[..., 2] <= 0.0
    return jnp.where(back, 0.0, res)
