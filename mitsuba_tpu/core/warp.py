"""Sampling warps: square <-> sphere/hemisphere/disk/cone/triangle/GGX etc.

TPU-native equivalent of the reference warp library (reference:
include/mitsuba/core/warp.h, 831 LoC).  Every warp has a matching pdf so the
chi^2 harness (mitsuba_tpu.chi2) can validate sample/pdf consistency, mirroring
the reference's test strategy (src/core/tests/test_warp.py).

All functions take uniform samples with trailing dim 2 (or 1) and return
direction/point arrays with trailing dim 3 (or 2); they broadcast over leading
wavefront axes and contain no data-dependent control flow (jit/TPU safe).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import INV_PI, INV_TWO_PI, INV_FOUR_PI, TWO_PI, safe_sqrt


# ---------------------------------------------------------------------------
# Disk
# ---------------------------------------------------------------------------

def square_to_uniform_disk_concentric(u):
    """Concentric (Shirley) disk mapping — low-distortion, preserves
    stratification (reference: warp.h square_to_uniform_disk_concentric)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quadrant_x, x, y)
    ratio = jnp.where(quadrant_x, y / jnp.where(x == 0, 1.0, x), x / jnp.where(y == 0, 1.0, y))
    phi = jnp.where(
        quadrant_x, 0.25 * jnp.pi * ratio, 0.5 * jnp.pi - 0.25 * jnp.pi * ratio
    )
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


# ---------------------------------------------------------------------------
# Sphere / hemisphere
# ---------------------------------------------------------------------------

def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.broadcast_to(jnp.asarray(INV_FOUR_PI, d.dtype), d.shape[:-1])


def square_to_uniform_hemisphere(u):
    z = u[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0, INV_TWO_PI, 0.0)


def square_to_cosine_hemisphere(u):
    """Cosine-weighted hemisphere via concentric disk + projection
    (reference: warp.h square_to_cosine_hemisphere)."""
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff."""
    one_minus = 1.0 - cos_cutoff
    cos_theta = 1.0 - u[..., 1] * one_minus
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TWO_PI * u[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_cone_pdf(d, cos_cutoff):
    in_cone = d[..., 2] >= cos_cutoff
    return jnp.where(in_cone, INV_TWO_PI / jnp.maximum(1.0 - cos_cutoff, 1e-12), 0.0)


# ---------------------------------------------------------------------------
# Triangle / square
# ---------------------------------------------------------------------------

def square_to_uniform_triangle(u):
    """Uniform barycentric coordinates on the unit triangle."""
    t = safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - t, t * u[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1)
    return jnp.where(inside, 2.0, 0.0)


def square_to_std_normal(u):
    """Box-Muller transform (reference: warp.h square_to_std_normal)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38)))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


# ---------------------------------------------------------------------------
# Phase-function / microfacet warps
# ---------------------------------------------------------------------------

def square_to_hg(u, g):
    """Henyey-Greenstein direction sample around +z (forward axis).

    Returns direction with cos(theta) distributed per the HG phase function
    (reference: src/phase/hg.cpp:75-105)."""
    g = jnp.asarray(g)
    tiny = jnp.abs(g) < 1e-3
    g_safe = jnp.where(tiny, 0.5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u[..., 1])
    cos_theta_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_theta_iso = 2.0 * u[..., 1] - 1.0  # exact g->0 limit of the inverse CDF
    cos_theta = jnp.where(tiny, cos_theta_iso, jnp.clip(cos_theta_hg, -1.0, 1.0))
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TWO_PI * u[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_hg_pdf(d, g):
    """HG pdf of direction d relative to +z axis."""
    cos_theta = d[..., 2]
    g = jnp.asarray(g)
    temp = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOUR_PI * (1.0 - g * g) / jnp.maximum(temp * safe_sqrt(temp), 1e-12)


def square_to_rayleigh(u):
    """Sample cos(theta) from the (unpolarized) Rayleigh phase function
    3/(16 pi) (1 + cos^2).  Closed-form inverse CDF via Cardano
    (reference: src/phase/rayleigh.cpp sampling)."""
    z = 2.0 * (2.0 * u[..., 1] - 1.0)
    a = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_theta = jnp.clip(a - 1.0 / a, -1.0, 1.0)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TWO_PI * u[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_rayleigh_pdf(d):
    cos_theta = d[..., 2]
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)


# ---------------------------------------------------------------------------
# Interval / tent
# ---------------------------------------------------------------------------

def interval_to_tent(u):
    """[0,1] -> [-1,1] tent distribution (reference: warp.h interval_to_tent)."""
    u2 = 2.0 * u
    side = u2 < 1.0
    return jnp.where(side, jnp.sqrt(jnp.maximum(u2, 0.0)) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - u2, 0.0)))


def square_to_tent(u):
    return jnp.stack([interval_to_tent(u[..., 0]), interval_to_tent(u[..., 1])], axis=-1)


def square_to_tent_pdf(p):
    inside = (jnp.abs(p[..., 0]) <= 1) & (jnp.abs(p[..., 1]) <= 1)
    return jnp.where(inside, (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1])), 0.0)
