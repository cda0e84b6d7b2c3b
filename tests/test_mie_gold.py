"""External-gold validation of the Lorenz-Mie solver (render/mie.py).

The reference environment can't fetch published tables (no network), so the
gold here is an INDEPENDENT implementation: the classic Bohren & Huffman
log-derivative algorithm (textbook standard, the basis of Wiscombe's MIEV0
validation suite), written in numpy complex128 with forward Riccati-Bessel
recursions — a completely different algorithm and precision than
render/mie.py's float32 downward-ratio lax.scan.  Agreement across size
parameters from 0.5 to 100 and absorbing spheres validates both.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.mie import mie, mie_nmax


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def bhmie_gold(x, m, mus):
    """Bohren & Huffman 1983 Mie solution, complex128.
    Returns (Qext, Qsca, S1 [len(mus)], S2)."""
    x = float(x)
    m = complex(m)
    nstop = int(x + 4.05 * x ** (1 / 3) + 2)
    nmx = int(max(nstop, abs(m * x)) + 16)

    # log-derivative D_n(mx) by downward recursion
    D = np.zeros(nmx + 1, complex)
    mx = m * x
    for n in range(nmx, 0, -1):
        D[n - 1] = n / mx - 1.0 / (D[n] + n / mx)

    mus = np.asarray(mus, np.float64)
    S1 = np.zeros(len(mus), complex)
    S2 = np.zeros(len(mus), complex)
    pi_nm1 = np.zeros(len(mus))
    pi_n = np.ones(len(mus))

    psi_nm1 = np.cos(x)            # psi_{-1}
    psi_n = np.sin(x)              # psi_0
    chi_nm1 = -np.sin(x)           # chi_{-1}
    chi_n = np.cos(x)              # chi_0
    xi_nm1 = psi_nm1 - 1j * chi_nm1
    xi_n = psi_n - 1j * chi_n

    Qext = 0.0
    Qsca = 0.0
    for n in range(1, nstop + 1):
        psi_np1 = (2 * n - 1) / x * psi_n - psi_nm1
        chi_np1 = (2 * n - 1) / x * chi_n - chi_nm1
        # psi_np1 is psi_n for THIS n (order n), recursion shifted:
        psi = psi_np1
        chi = chi_np1
        xi = psi - 1j * chi

        a_n = ((D[n] / m + n / x) * psi - psi_n) / ((D[n] / m + n / x) * xi - xi_n)
        b_n = ((D[n] * m + n / x) * psi - psi_n) / ((D[n] * m + n / x) * xi - xi_n)

        Qext += (2 * n + 1) * (a_n + b_n).real
        Qsca += (2 * n + 1) * (abs(a_n) ** 2 + abs(b_n) ** 2)

        tau_n = n * mus * pi_n - (n + 1) * pi_nm1
        fac = (2 * n + 1) / (n * (n + 1))
        S1 += fac * (a_n * pi_n + b_n * tau_n)
        S2 += fac * (a_n * tau_n + b_n * pi_n)

        pi_np1 = ((2 * n + 1) * mus * pi_n - (n + 1) * pi_nm1) / n
        pi_nm1 = pi_n
        pi_n = pi_np1

        psi_nm1, psi_n = psi_n, psi
        chi_nm1, chi_n = chi_n, chi
        xi_nm1, xi_n = xi_n, xi

    Qext *= 2.0 / x**2
    Qsca *= 2.0 / x**2
    return Qext, Qsca, S1, S2


CASES = [
    # (size parameter x, relative ior m) — spans Rayleigh-ish to large
    (0.5, 1.33 + 0.0j),
    (5.0, 1.33 + 0.0j),
    (10.0, 1.50 + 0.0j),
    (30.0, 1.33 + 1e-3j),      # weakly absorbing (water-like)
    (100.0, 1.33 + 0.0j),
]


@pytest.mark.parametrize("x,m", CASES)
def test_mie_cross_sections_vs_gold(x, m):
    Qext_g, Qsca_g, _, _ = bhmie_gold(x, m, [0.0])
    # wavelength = 2 pi, n_med = 1  =>  x = radius
    nmax = mie_nmax(x)
    S1, S2, Ns, Cs, Ct = mie(
        2.0 * np.pi, jnp.asarray([0.0]), x, 1.0 + 0.0j, m, nmax
    )
    area = np.pi * x**2
    Qext = float(Ct[0]) / area
    Qsca = float(Cs[0]) / area
    assert abs(Qext - Qext_g) / Qext_g < 2e-3, (Qext, Qext_g)
    assert abs(Qsca - Qsca_g) / Qsca_g < 2e-3, (Qsca, Qsca_g)
    if abs(m.imag) > 0:
        # absorbing sphere: Qext > Qsca in both implementations
        assert Qext > Qsca and Qext_g > Qsca_g


@pytest.mark.parametrize("x,m", [(0.5, 1.33 + 0.0j), (5.0, 1.33 + 0.0j), (10.0, 1.5 + 0.0j)])
def test_mie_amplitudes_vs_gold(x, m):
    mus = np.linspace(-0.95, 0.95, 21)
    _, _, S1_g, S2_g = bhmie_gold(x, m, mus)
    nmax = mie_nmax(x)
    S1, S2, _, _, _ = mie(2.0 * np.pi, jnp.asarray(mus), x, 1.0 + 0.0j, m, nmax)
    S1 = np.asarray(S1).astype(complex)
    S2 = np.asarray(S2).astype(complex)
    # naming convention: the reference (mie.h:34-36, mirrored by render/mie.py)
    # calls the ordinary-ray amplitude S1 = sum kn (a tau + b pi), which is
    # Bohren-Huffman's S2 — so compare crosswise; intensities are
    # phase-invariant
    i1, i2 = np.abs(S2) ** 2, np.abs(S1) ** 2
    i1_g, i2_g = np.abs(S1_g) ** 2, np.abs(S2_g) ** 2
    scale = i1_g.max()
    np.testing.assert_allclose(i1 / scale, i1_g / scale, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(i2 / scale, i2_g / scale, rtol=5e-3, atol=1e-5)
    # and the relative polarization ratio pointwise
    pol = (i1 - i2) / (i1 + i2)
    pol_g = (i1_g - i2_g) / (i1_g + i2_g)
    np.testing.assert_allclose(pol, pol_g, atol=5e-3)
