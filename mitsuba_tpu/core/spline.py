"""Cubic Catmull-Rom spline utilities (reference: include/mitsuba/core/spline.h).

The reference provides uniform/non-uniform 1D evaluation, definite
integration, monotone inversion, and importance sampling of spline-encoded
densities (used e.g. by measured-data plugins and the spectra machinery).
TPU-native stance: all entry points are vectorized over query batches, use
branchless gathers/one-hot lookups for the 4-node stencil, and a fixed-count
Newton-bisection loop (lax.fori_loop) for inversion — no data-dependent
control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hermite(t, f0, f1, d0, d1):
    """Cubic Hermite basis on [0,1] (spline.h eval_spline)."""
    t2 = t * t
    t3 = t2 * t
    return (
        (2.0 * t3 - 3.0 * t2 + 1.0) * f0
        + (-2.0 * t3 + 3.0 * t2) * f1
        + (t3 - 2.0 * t2 + t) * d0
        + (t3 - t2) * d1
    )


def _stencil_uniform(values, idx):
    """(f0, f1, d0, d1) for interval idx of a uniformly-spaced node array
    (one-sided differences at the ends; spline.h eval_spline_weights)."""
    n = values.shape[0]
    f0 = values[idx]
    f1 = values[idx + 1]
    fm = values[jnp.maximum(idx - 1, 0)]
    fp = values[jnp.minimum(idx + 2, n - 1)]
    # interior: central differences; ends: second-order one-sided (exact for
    # quadratics, matching spline.h's boundary handling)
    d0 = jnp.where(idx > 0, 0.5 * (f1 - fm), -1.5 * f0 + 2.0 * f1 - 0.5 * fp)
    d1 = jnp.where(idx + 2 < n, 0.5 * (fp - f0), 1.5 * f1 - 2.0 * f0 + 0.5 * fm)
    return f0, f1, d0, d1


def eval_1d(x0, x1, values, x):
    """Catmull-Rom interpolation of `values` sampled uniformly on [x0, x1]
    at query points x (reference: spline.h eval_1d, uniform variant).
    Out-of-domain queries clamp to the boundary values."""
    values = jnp.asarray(values)
    x = jnp.asarray(x)
    n = values.shape[0]
    t_full = (x - x0) / (x1 - x0) * (n - 1)
    idx = jnp.clip(t_full.astype(jnp.int32), 0, n - 2)
    t = jnp.clip(t_full - idx, 0.0, 1.0)
    f0, f1, d0, d1 = _stencil_uniform(values, idx)
    return _hermite(t, f0, f1, d0, d1)


def _tangents_nonuniform(idx, n, x_lo, x_hi, xm, xp, f0, f1, fm, fp):
    """Hermite tangents (in unit-interval t units) for non-uniform nodes:
    interior = central differences over [xm, xp]; boundary = second-order
    one-sided three-point derivative (exact for quadratics)."""
    w = jnp.maximum(x_hi - x_lo, 1e-20)

    def safe(v):
        return jnp.where(jnp.abs(v) > 1e-20, v, 1e-20)

    # d/dx at x_lo via (x_lo, x_hi, xp)
    d0_end = w * (
        f0 * (1.0 / safe(x_lo - x_hi) + 1.0 / safe(x_lo - xp))
        + f1 * (x_lo - xp) / safe((x_hi - x_lo) * (x_hi - xp))
        + fp * (x_lo - x_hi) / safe((xp - x_lo) * (xp - x_hi))
    )
    # d/dx at x_hi via (xm, x_lo, x_hi)
    d1_end = w * (
        f1 * (1.0 / safe(x_hi - x_lo) + 1.0 / safe(x_hi - xm))
        + f0 * (x_hi - xm) / safe((x_lo - x_hi) * (x_lo - xm))
        + fm * (x_hi - x_lo) / safe((xm - x_hi) * (xm - x_lo))
    )
    d0 = jnp.where(idx > 0, w * (f1 - fm) / jnp.maximum(x_hi - xm, 1e-20), d0_end)
    d1 = jnp.where(idx + 2 < n, w * (fp - f0) / jnp.maximum(xp - x_lo, 1e-20), d1_end)
    return d0, d1


def eval_1d_nonuniform(nodes, values, x):
    """Catmull-Rom interpolation over arbitrary increasing `nodes`
    (reference: spline.h eval_1d non-uniform variant)."""
    nodes = jnp.asarray(nodes)
    values = jnp.asarray(values)
    x = jnp.asarray(x)
    n = nodes.shape[0]
    idx = jnp.clip(
        jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2
    )
    x_lo = nodes[idx]
    x_hi = nodes[idx + 1]
    w = jnp.maximum(x_hi - x_lo, 1e-20)
    t = jnp.clip((x - x_lo) / w, 0.0, 1.0)
    f0 = values[idx]
    f1 = values[idx + 1]
    fm = values[jnp.maximum(idx - 1, 0)]
    fp = values[jnp.minimum(idx + 2, n - 1)]
    xm = nodes[jnp.maximum(idx - 1, 0)]
    xp = nodes[jnp.minimum(idx + 2, n - 1)]
    # non-uniform tangents scaled to the local interval (spline.h:272-293)
    d0, d1 = _tangents_nonuniform(idx, n, x_lo, x_hi, xm, xp, f0, f1, fm, fp)
    return _hermite(t, f0, f1, d0, d1)


def integrate_1d(x0, x1, values):
    """Cumulative definite integral of the uniform Catmull-Rom interpolant:
    returns [n] with out[0] = 0, out[i] = ∫_{x0}^{node_i} f (reference:
    spline.h integrate_1d).  Exact per-interval antiderivative of the cubic."""
    values = jnp.asarray(values)
    n = values.shape[0]
    h = (x1 - x0) / (n - 1)
    idx = jnp.arange(n - 1)
    f0, f1, d0, d1 = _stencil_uniform(values, idx)
    # ∫0^1 hermite dt = (f0+f1)/2 + (d0-d1)/12
    per = h * (0.5 * (f0 + f1) + (d0 - d1) / 12.0)
    return jnp.concatenate([jnp.zeros((1,), values.dtype), jnp.cumsum(per)])


def _interval_integral(t, f0, f1, d0, d1):
    """Antiderivative of the Hermite cubic on [0, t] (unit interval)."""
    t2 = t * t
    t3 = t2 * t
    t4 = t3 * t
    return (
        f0 * (0.5 * t4 - t3 + t)
        + f1 * (-0.5 * t4 + t3)
        + d0 * (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2)
        + d1 * (0.25 * t4 - t3 / 3.0)
    )


def invert_1d(x0, x1, values, y, n_iter=16):
    """Solve F(x) = y for the monotone uniform spline F (reference:
    spline.h invert_1d).  Newton iterations with bisection safeguarding,
    fixed count — XLA-friendly."""
    values = jnp.asarray(values)
    y = jnp.asarray(y)
    n = values.shape[0]
    h = (x1 - x0) / (n - 1)
    idx = jnp.clip(jnp.searchsorted(values, y, side="right") - 1, 0, n - 2)
    f0, f1, d0, d1 = _stencil_uniform(values, idx)

    lo = jnp.zeros_like(y)
    hi = jnp.ones_like(y)
    t = jnp.full_like(y, 0.5)

    def body(_, st):
        t, lo, hi = st
        val = _hermite(t, f0, f1, d0, d1)
        too_low = val < y
        lo = jnp.where(too_low, t, lo)
        hi = jnp.where(too_low, hi, t)
        deriv = (
            (6.0 * t * t - 6.0 * t) * f0
            + (-6.0 * t * t + 6.0 * t) * f1
            + (3.0 * t * t - 4.0 * t + 1.0) * d0
            + (3.0 * t * t - 2.0 * t) * d1
        )
        t_n = t - (val - y) / jnp.where(jnp.abs(deriv) > 1e-12, deriv, 1.0)
        bad = (t_n <= lo) | (t_n >= hi) | (jnp.abs(deriv) <= 1e-12)
        t = jnp.where(bad, 0.5 * (lo + hi), t_n)
        return t, lo, hi

    t, _, _ = jax.lax.fori_loop(0, n_iter, body, (t, lo, hi))
    return x0 + (idx + t) * h


def sample_1d(x0, x1, values, u, n_iter=16):
    """Importance-sample the density proportional to the uniform spline
    interpolant of `values` (reference: spline.h sample_1d).
    Returns (x, pdf(x))."""
    values = jnp.asarray(values)
    u = jnp.asarray(u)
    n = values.shape[0]
    h = (x1 - x0) / (n - 1)
    cdf = integrate_1d(x0, x1, values)
    total = cdf[-1]
    target = u * total
    idx = jnp.clip(jnp.searchsorted(cdf, target, side="right") - 1, 0, n - 2)
    f0, f1, d0, d1 = _stencil_uniform(values, idx)
    y = (target - cdf[idx]) / h   # remaining mass in unit-interval units

    lo = jnp.zeros_like(u)
    hi = jnp.ones_like(u)
    t = jnp.full_like(u, 0.5)

    def body(_, st):
        t, lo, hi = st
        val = _interval_integral(t, f0, f1, d0, d1)
        too_low = val < y
        lo = jnp.where(too_low, t, lo)
        hi = jnp.where(too_low, hi, t)
        deriv = _hermite(t, f0, f1, d0, d1)
        t_n = t - (val - y) / jnp.where(jnp.abs(deriv) > 1e-12, deriv, 1.0)
        bad = (t_n <= lo) | (t_n >= hi) | (jnp.abs(deriv) <= 1e-12)
        t = jnp.where(bad, 0.5 * (lo + hi), t_n)
        return t, lo, hi

    t, _, _ = jax.lax.fori_loop(0, n_iter, body, (t, lo, hi))
    x = x0 + (idx + t) * h
    pdf = _hermite(t, f0, f1, d0, d1) / total
    return x, pdf


def eval_2d(x_nodes, y_nodes, values, x, y):
    """Bicubic Catmull-Rom on a non-uniform tensor grid: values [Ny, Nx]
    (reference: spline.h eval_2d).  Interpolates along x for the 4-row
    stencil, then along y."""
    x_nodes = jnp.asarray(x_nodes)
    y_nodes = jnp.asarray(y_nodes)
    values = jnp.asarray(values)
    ny = y_nodes.shape[0]
    iy = jnp.clip(jnp.searchsorted(y_nodes, y, side="right") - 1, 0, ny - 2)

    def row(offset):
        r = jnp.clip(iy + offset, 0, ny - 1)
        return _eval_rows(x_nodes, values, r, x)

    fm = row(-1)
    f0 = row(0)
    f1 = row(1)
    fp = row(2)
    y_lo = y_nodes[iy]
    y_hi = y_nodes[iy + 1]
    w = jnp.maximum(y_hi - y_lo, 1e-20)
    t = jnp.clip((y - y_lo) / w, 0.0, 1.0)
    ym = y_nodes[jnp.maximum(iy - 1, 0)]
    yp = y_nodes[jnp.minimum(iy + 2, ny - 1)]
    d0, d1 = _tangents_nonuniform(iy, ny, y_lo, y_hi, ym, yp, f0, f1, fm, fp)
    return _hermite(t, f0, f1, d0, d1)


def _eval_rows(x_nodes, values, rows, x):
    """eval_1d_nonuniform of per-query rows of `values` at per-query x."""
    nx = x_nodes.shape[0]
    idx = jnp.clip(jnp.searchsorted(x_nodes, x, side="right") - 1, 0, nx - 2)
    x_lo = x_nodes[idx]
    x_hi = x_nodes[idx + 1]
    w = jnp.maximum(x_hi - x_lo, 1e-20)
    t = jnp.clip((x - x_lo) / w, 0.0, 1.0)
    f0 = values[rows, idx]
    f1 = values[rows, idx + 1]
    fm = values[rows, jnp.maximum(idx - 1, 0)]
    fp = values[rows, jnp.minimum(idx + 2, nx - 1)]
    xm = x_nodes[jnp.maximum(idx - 1, 0)]
    xp = x_nodes[jnp.minimum(idx + 2, nx - 1)]
    d0, d1 = _tangents_nonuniform(idx, nx, x_lo, x_hi, xm, xp, f0, f1, fm, fp)
    return _hermite(t, f0, f1, d0, d1)
