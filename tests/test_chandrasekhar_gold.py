"""External gold: Chandrasekhar's exact solution for diffuse reflection from
a semi-infinite, isotropically-scattering atmosphere (Radiative Transfer,
1960, ch. V-VI).

The reflected intensity for parallel incident flux pi*F per unit area normal
to the beam is

    I(mu, mu0) = (omega F / 4) * mu0 / (mu + mu0) * H(mu) H(mu0)

with H the Chandrasekhar H-function, the solution of

    H(mu) = 1 + mu H(mu) (omega/2) Integral_0^1 H(mu')/(mu+mu') dmu'.

The H-function is computed here by fixed-point iteration on Gauss-Legendre
nodes and validated against the exact zeroth-moment identity
Integral H dmu = 2(1-sqrt(1-omega))/omega before it is used as the gold.
This is a fully hardware- and renderer-independent reference for volumetric
multiple scattering (the role of test_renders.py's golden images,
reference: src/render/tests/test_renders.py)."""
import numpy as np
import pytest

import mitsuba_tpu as mi

OMEGA = 0.8


def h_function(omega, n_nodes=64, iters=800):
    x, w = np.polynomial.legendre.leggauss(n_nodes)
    mu = 0.5 * (x + 1.0)          # nodes on (0,1)
    wq = 0.5 * w
    H = np.ones(n_nodes)
    for _ in range(iters):
        integral = ((H * wq)[None, :] / (mu[:, None] + mu[None, :])).sum(-1)
        # the contraction form H <- 1/(1 - mu (w/2) Int) converges for w<1
        H = 1.0 / (1.0 - 0.5 * omega * mu * integral)
    return mu, wq, H


def h_at(mu_eval, omega):
    """H at an arbitrary mu via the converged quadrature table."""
    mu, wq, H = h_function(omega)
    integral = ((H * wq) / (mu_eval + mu)).sum()
    return 1.0 / (1.0 - 0.5 * omega * mu_eval * integral)


def test_h_function_moment_identity():
    """Solver check: Integral_0^1 H dmu == 2(1-sqrt(1-omega))/omega exactly."""
    mu, wq, H = h_function(OMEGA)
    alpha0 = (H * wq).sum()
    exact = 2.0 * (1.0 - np.sqrt(1.0 - OMEGA)) / OMEGA
    assert abs(alpha0 - exact) < 2e-3, (alpha0, exact)


def _scene(theta_deg, theta0_deg, spp):
    s, c = np.sin(np.radians(theta_deg)), np.cos(np.radians(theta_deg))
    s0, c0 = np.sin(np.radians(theta0_deg)), np.cos(np.radians(theta0_deg))
    return {
        "type": "scene",
        "integrator": {
            "type": "volpath", "max_depth": 48, "rr_depth": 16,
            "track_steps": 8, "nee_steps": 8,
        },
        "light": {
            "type": "directional",
            "direction": [s0, 0.0, -c0],
            "irradiance": 1.0,
        },
        # optically semi-infinite slab: tau = sigma_t * 20 = 30
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [2000.0, 2000.0, 10.0]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "homogeneous",
                "sigma_t": 1.5,
                "albedo": OMEGA,
                "phase": {"type": "isotropic"},
            },
        },
        "sensor": {
            "type": "radiancemeter",
            "to_world": [{
                "type": "look_at",
                "origin": [0.0, 0.0, 12.0],
                "target": [2.0 * s, 0.0, 12.0 - 2.0 * c],
                "up": [0, 1, 0],
            }],
            "film": {"type": "hdrfilm", "width": 4, "height": 4,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
    }


@pytest.mark.parametrize("theta,theta0", [(0.0, 30.0), (45.0, 30.0)])
def test_semi_infinite_isotropic_reflection(theta, theta0):
    mi.set_variant("mono")
    mu = float(np.cos(np.radians(theta)))
    mu0 = float(np.cos(np.radians(theta0)))
    # E = 1 incident irradiance (per unit area normal to the beam) => F = 1/pi
    want = OMEGA / (4.0 * np.pi) * mu0 / (mu + mu0) * h_at(mu, OMEGA) * h_at(mu0, OMEGA)

    scene = mi.load_dict(_scene(theta, theta0, spp=8192))
    img = np.asarray(mi.render(scene, spp=8192, seed=11))
    got = float(img.mean())
    mi.set_variant("rgb")
    assert abs(got - want) / want < 0.05, (got, want)
