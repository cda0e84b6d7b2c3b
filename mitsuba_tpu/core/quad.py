"""Quadrature node/weight generation (reference: include/mitsuba/core/quad.h:27).

Gauss-Legendre feeds the SizeDistribution machinery (reference:
src/render/sizedistr.cpp:12-24) and the chi^2 harness's pdf integration.
Node generation is a setup-time operation; we compute with numpy in float64
and return device-ready jnp arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n: int):
    """n-point Gauss-Legendre nodes/weights on [-1, 1] (float64 -> f32)."""
    x, w = np.polynomial.legendre.leggauss(int(n))
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def gauss_legendre_interval(n: int, a: float, b: float):
    """Nodes/weights scaled to [a, b] — mirrors the reference's scaling of
    Gauss nodes to [min_radius, max_radius] (src/render/sizedistr.cpp:16-24)."""
    x, w = np.polynomial.legendre.leggauss(int(n))
    half = 0.5 * (b - a)
    mid = 0.5 * (b + a)
    return jnp.asarray(mid + half * x, jnp.float32), jnp.asarray(half * w, jnp.float32)


def gauss_lobatto(n: int):
    """n-point Gauss-Lobatto nodes/weights on [-1, 1] (includes endpoints).
    (reference: quad.h gauss_lobatto)."""
    if n < 2:
        raise ValueError("gauss_lobatto needs n >= 2")
    # Nodes are roots of P'_{n-1} plus endpoints; find via eigen of Jacobi-like
    # recurrence on Legendre derivative — use Newton iteration from Chebyshev init.
    m = n - 1
    x = np.cos(np.pi * np.arange(n) / m)
    P = np.zeros((n, n))
    x_old = np.full_like(x, 2.0)
    for _ in range(200):
        if np.max(np.abs(x - x_old)) < 1e-15:
            break
        x_old = x.copy()
        P[:, 0] = 1.0
        P[:, 1] = x
        for k in range(2, n):
            P[:, k] = ((2 * k - 1) * x * P[:, k - 1] - (k - 1) * P[:, k - 2]) / k
        x = x_old - (x * P[:, m] - P[:, m - 1]) / (n * P[:, m])
    w = 2.0 / (m * n * P[:, m] ** 2)
    order = np.argsort(x)
    return jnp.asarray(x[order], jnp.float32), jnp.asarray(w[order], jnp.float32)


def composite_simpson(n: int):
    """Composite Simpson weights on [-1, 1] with n (odd) nodes
    (reference: quad.h composite_simpson)."""
    if n % 2 != 1 or n < 3:
        raise ValueError("composite_simpson needs odd n >= 3")
    h = 2.0 / (n - 1)
    x = np.linspace(-1.0, 1.0, n)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= h / 3.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)
