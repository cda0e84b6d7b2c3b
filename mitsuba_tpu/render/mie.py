"""Lorenz-Mie scattering solver (fork addition; reference:
include/mitsuba/render/mie.h:45-222, after Mishchenko & Yang 2018).

Evaluates complex scattering amplitudes S1/S2, phase normalization Ns and
scattering/extinction cross sections Cs/Ct of a dielectric sphere in a
(possibly absorbing) host medium.  Amplitude convention follows the reference
exactly (mie.h:199-202 — note its S1/S2 are swapped relative to
Bohren & Huffman; mueller.mie_scatter consumes this convention).

TPU mapping: the reference's three dr::Loops over the series index
(mie.h:90-210, recorded-loop mode disabled) become lax.scans with *static*
trip counts — the caller supplies nmax (host-side via mie_nmax, since table
baking is a setup-time operation; SURVEY.md §3.5: precompute Mie -> bake into
tabphase_polarized tables resident in HBM).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

TWO_PI = 2.0 * np.pi


def mie_nmax(x_norm_max: float) -> int:
    """Series length, Mishchenko & Yang 2018 stopping criterion
    (reference: mie.h:76-80)."""
    return int(8 + x_norm_max + 4.05 * np.cbrt(x_norm_max))


def _j_ratio_table(z, ndown):
    """Downward recurrence for j_n(z)/j_{n-1}(z), n = ndown-1 .. 1
    (reference: mie.h:86-116).  Returns [ndown, ...] with entry n holding the
    ratio for index n (entry 0 unused)."""
    rcp_z = 1.0 / z
    jr = z / (2.0 * ndown + 1.0)

    def body(carry, n):
        jr = carry
        kn = (2.0 * n + 1.0) * rcp_z
        jr = 1.0 / (kn - jr)
        return jr, jr

    ns = jnp.arange(ndown - 1, 0, -1, dtype=jnp.float32)
    _, out = jax.lax.scan(body, jr, ns)
    # out[k] is ratio for n = ndown-1-k; reorder to index-by-n
    out = out[::-1]
    pad = jnp.zeros_like(out[:1])
    return jnp.concatenate([pad, out], axis=0)   # [ndown, ...]


def mie(wavelength, mu, radius, ior_med, ior_sph, nmax):
    """Mie series (reference: mie.h:45-221).

    All array args broadcast; nmax static.  Returns (S1, S2, Ns, Cs, Ct)."""
    wavelength = jnp.asarray(wavelength, jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    ior_med = jnp.asarray(ior_med, jnp.complex64)
    ior_sph = jnp.asarray(ior_sph, jnp.complex64)

    m = ior_sph / ior_med
    kx = TWO_PI * ior_med / wavelength
    ky = TWO_PI * ior_sph / wavelength
    x = kx * radius
    y = ky * radius
    m_sq = m * m
    rcp_x = 1.0 / x
    rcp_y = 1.0 / y

    shape = jnp.broadcast_shapes(
        jnp.shape(mu), jnp.shape(x), jnp.shape(y), jnp.shape(m)
    )
    mu = jnp.broadcast_to(mu, shape)
    x = jnp.broadcast_to(x, shape)
    y = jnp.broadcast_to(y, shape)
    rcp_x = jnp.broadcast_to(rcp_x, shape)
    rcp_y = jnp.broadcast_to(rcp_y, shape)
    m_sq = jnp.broadcast_to(m_sq, shape)

    ndown = int(nmax + 8 * np.sqrt(nmax) + 3)
    j_ratio_x = _j_ratio_table(x, ndown)
    j_ratio_y = _j_ratio_table(y, ndown)

    i_unit = jnp.asarray(1j, jnp.complex64)
    jx_0 = jnp.sin(x) * rcp_x
    jy_0 = jnp.sin(y) * rcp_y
    h_exp = jnp.exp(i_unit * x) * rcp_x
    hx_0 = -i_unit * h_exp
    hx_1 = -h_exp * (1.0 + i_unit * rcp_x)

    pi_0 = jnp.zeros(shape, jnp.float32)
    pi_1 = jnp.ones(shape, jnp.float32)
    S1 = jnp.zeros(shape, jnp.complex64)
    S2 = jnp.zeros(shape, jnp.complex64)
    Ns = jnp.zeros(shape, jnp.float32)
    Cs = jnp.zeros(shape, jnp.float32)
    Ct = jnp.zeros(shape, jnp.float32)

    def body(carry, inputs):
        jx_0, jy_0, hx_0, hx_1, pi_0, pi_1, S1, S2, Ns, Cs, Ct = carry
        fn, jrx, jry = inputs
        is_first = fn == 1.0

        # Hankel upward recurrence (reference: mie.h:151-162)
        hx_n_rec = (2.0 * fn - 1.0) * rcp_x * hx_1 - hx_0
        hx_n = jnp.where(is_first, hx_1, hx_n_rec)
        hx_dx = jnp.where(is_first, x * hx_0 - fn * hx_1, x * hx_1 - fn * hx_n)
        hx_0n = jnp.where(is_first, hx_0, hx_1)
        hx_1n = jnp.where(is_first, hx_1, hx_n)

        jx_n = jrx * jx_0
        jy_n = jry * jy_0
        jx_dx = x * jx_0 - fn * jx_n
        jy_dy = y * jy_0 - fn * jy_n

        # Legendre-derived angle functions (Bohren & Huffman p.95;
        # reference: mie.h:171-183)
        pi_n_rec = ((2.0 * fn - 1.0) / (fn - 1.0 + 1e-20)) * mu * pi_1 - (
            fn / (fn - 1.0 + 1e-20)
        ) * pi_0
        pi_n = jnp.where(is_first, pi_1, pi_n_rec)
        tau_n = jnp.where(is_first, mu, fn * mu * pi_n - (fn + 1.0) * pi_1)
        pi_0n = jnp.where(is_first, pi_0, pi_1)
        pi_1n = jnp.where(is_first, pi_1, pi_n)

        # Lorenz-Mie coefficients (reference: mie.h:186-190, Eqs. 9-10)
        a_n = (m_sq * jy_n * jx_dx - jx_n * jy_dy) / (
            m_sq * jy_n * hx_dx - hx_n * jy_dy
        )
        b_n = (jy_n * jx_dx - jx_n * jy_dy) / (jy_n * hx_dx - hx_n * jy_dy)

        bad = (
            jnp.isnan(jnp.real(a_n)) | jnp.isnan(jnp.imag(a_n))
            | jnp.isnan(jnp.real(b_n)) | jnp.isnan(jnp.imag(b_n))
        )
        a_n = jnp.where(bad, 0.0, a_n)
        b_n = jnp.where(bad, 0.0, b_n)

        cn = 2.0 * fn + 1.0
        kn = cn / (fn * (fn + 1.0))
        S1 = S1 + kn * (a_n * tau_n + b_n * pi_n)
        S2 = S2 + kn * (a_n * pi_n + b_n * tau_n)
        sq = jnp.real(a_n) ** 2 + jnp.imag(a_n) ** 2 + jnp.real(b_n) ** 2 + jnp.imag(b_n) ** 2
        Ns = Ns + cn * sq
        Cs = Cs + cn * sq
        Ct = Ct + jnp.real(cn * (a_n + b_n))

        return (jx_n, jy_n, hx_0n, hx_1n, pi_0n, pi_1n, S1, S2, Ns, Cs, Ct), None

    fns = jnp.arange(1, nmax + 1, dtype=jnp.float32)
    carry = (jx_0, jy_0, hx_0, hx_1, pi_0, pi_1, S1, S2, Ns, Cs, Ct)
    carry, _ = jax.lax.scan(body, carry, (fns, j_ratio_x[1 : nmax + 1], j_ratio_y[1 : nmax + 1]))
    _, _, _, _, _, _, S1, S2, Ns, Cs, Ct = carry

    S1 = S1 * (i_unit / kx)
    S2 = S2 * (i_unit / kx)
    k = TWO_PI / (jnp.real(kx) ** 2 + jnp.imag(kx) ** 2)
    return S1, S2, Ns * k, Cs * k, Ct * k
