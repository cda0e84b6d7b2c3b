"""Polarization tests: Mueller calculus units (mirroring the reference's
src/render/tests/test_mueller.py) + polarized transport physics."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render import mueller as mu


# ---------------------------------------------------------------------------
# Mueller calculus units
# ---------------------------------------------------------------------------

def test_rotator_basics():
    # horizontally polarized light through a +45deg rotator -> -45deg linear
    # (reference: mueller.h rotator docs example)
    s = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    R = mu.rotator(jnp.deg2rad(45.0))
    out = np.asarray(R @ s)
    np.testing.assert_allclose(out, [1, 0, -1, 0], atol=1e-6)


def test_linear_polarizer_malus():
    # Malus' law via rotated polarizer elements
    for theta in [0.0, 30.0, 45.0, 90.0]:
        P = mu.rotated_element(jnp.deg2rad(theta), mu.linear_polarizer(1.0))
        s_in = jnp.asarray([1.0, 1.0, 0.0, 0.0])  # horizontal linear
        out = np.asarray(P @ s_in)
        expected_i = np.cos(np.deg2rad(theta)) ** 2
        np.testing.assert_allclose(out[0], expected_i, atol=1e-6)


def test_specular_reflection_normal_incidence():
    # normal incidence on glass: R = ((1-n)/(1+n))^2 = 0.04 for n=1.5
    M = np.asarray(mu.specular_reflection(jnp.asarray(1.0), jnp.asarray(1.5 + 0j)))
    np.testing.assert_allclose(M[0, 0], 0.04, atol=1e-4)
    np.testing.assert_allclose(M[0, 1], 0.0, atol=1e-6)  # no diattenuation


def test_brewster_fully_polarized():
    # at Brewster's angle the reflected light is 100% s-polarized:
    # M00 == -M01 (Verdet convention: a_p = 0 -> b = (rs-rp)/2 = rs/2 = a)
    theta_b = np.arctan(1.5)
    M = np.asarray(
        mu.specular_reflection(jnp.asarray(np.cos(theta_b)), jnp.asarray(1.5 + 0j))
    )
    dolp = np.abs(M[0, 1]) / M[0, 0]
    np.testing.assert_allclose(dolp, 1.0, atol=1e-4)


def test_rotate_stokes_basis_roundtrip():
    rng = np.random.default_rng(0)
    fwd = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    b0 = mu.stokes_basis(fwd)
    # rotate to an arbitrary second basis and back
    from mitsuba_tpu.core.frame import coordinate_system, cross, normalize

    b1 = normalize(b0 + 0.5 * cross(fwd, b0))
    R01 = mu.rotate_stokes_basis(fwd, b0, b1)
    R10 = mu.rotate_stokes_basis(fwd, b1, b0)
    I = np.asarray(R10 @ R01)
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_rayleigh_90deg_fully_polarized():
    # single Rayleigh scattering (rho=0) at 90 deg: DoLP = 1
    M = np.asarray(mu.rayleigh_scatter(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0)))
    dolp = abs(M[1, 0]) / M[0, 0]
    np.testing.assert_allclose(dolp, 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Polarized transport
# ---------------------------------------------------------------------------

def test_polarized_I_matches_unpolarized():
    """Diffuse-only scene: the I component of the polarized render equals the
    unpolarized render (depolarizer chains preserve intensity; identical RNG
    decisions in both modes)."""
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 24
    d["sensor"]["film"]["height"] = 24
    d["integrator"] = {"type": "volpath", "max_depth": 4}

    mi.set_variant("rgb")
    img_u = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=4))

    mi.set_variant("rgb_polarized")
    img_p = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=4))
    mi.set_variant("rgb")

    assert img_p.shape == (24, 24, 4, 3)
    np.testing.assert_allclose(img_p[:, :, 0, :], img_u, atol=1e-4)
    # Q/U/V vanish for purely depolarizing scenes
    assert np.abs(img_p[:, :, 1:, :]).max() < 1e-4


def test_rayleigh_single_scatter_polarization():
    """Unpolarized sun + optically thin Rayleigh slab viewed at 90 degrees:
    single scattering gives strongly linearly polarized light (DoLP -> 1 for
    rho = 0) — the defining physics of the NASA fork's sky models."""
    mi.set_variant("mono_polarized")
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 2},
        # sun shining straight down (-z)
        "sun": {"type": "directional", "direction": [0, 0, -1], "irradiance": 10.0},
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]}],
            "bsdf": {"type": "null"},
            "interior": {"type": "ref", "id": "atmo"},
        },
        "atmo": {
            "type": "homogeneous",
            "sigma_t": 0.05,       # optically thin: single scattering dominates
            "albedo": 1.0,
            "phase": {"type": "rayleigh", "depolarization": 0.0},
        },
        # radiancemeter at the origin looking along +x (90 deg to the sun)
        "sensor": {
            "type": "radiancemeter",
            "to_world": [
                {"type": "look_at", "origin": [-25.0, 0.0, 0.0], "target": [1, 0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 4, "height": 4, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 512},
        },
    }
    scene = mi.load_dict(d)
    spec = np.asarray(mi.render_1(scene, spp=2048))
    mi.set_variant("rgb")
    I, Q, U, V = spec[:, 0]
    assert I > 0
    dolp = np.sqrt(Q**2 + U**2 + V**2) / I
    # 90-degree Rayleigh single scattering: fully polarized perpendicular to
    # the scattering plane; multiple scattering (tiny at tau=0.05) washes out
    # a few percent
    assert dolp > 0.85, (I, Q, U, V, dolp)
    # scattering plane is x-z; polarization along y -> in the sensor's
    # vertical-referenced basis this is Q-dominant
    assert abs(Q) / I > 0.8
    assert abs(U) / I < 0.1 and abs(V) / I < 0.05
